"""Dependency-free OpenUSD scene-graph core (`.usda` text format).

The reference fork's robot-asset tools (`src/utils/step_to_usd.py`,
`src/utils/usd_modification.py`) author and edit USD stages through the
`pxr` bindings, which are not installable in this image. This module
implements the subset of the USD object model those tools exercise —
prims, typed attributes, relationships, references, applied API schemas,
xformOps, and stage/layer metadata — together with a writer AND parser for
the official `.usda` text syntax, so stages produced here load in any real
USD runtime (usdview, Isaac Sim) and real `.usda` files round-trip here.

Scope notes (vs the full USD spec):
- One layer per stage; no composition arcs beyond per-prim `references`
  (recorded and preserved verbatim, not flattened — exactly how the
  reference tools use them).
- No timeSamples, variants, payloads, or inherits; attribute values are
  "default" values only.
- Quaternions use the Gf constructor order ``(w, x, y, z)``, matching how
  `.usda` prints `quatf`/`quatd` (identity = ``(1, 0, 0, 0)``).

Everything numeric rides numpy; there are no other dependencies.
"""

from __future__ import annotations

import math
import os
import re
from typing import Iterator, Optional, Union

import numpy as np

# ---------------------------------------------------------------------------
# Gf-equivalent math (numpy)
# ---------------------------------------------------------------------------


def quat_identity() -> np.ndarray:
    return np.array([1.0, 0.0, 0.0, 0.0])


def quat_from_axis_angle(axis, degrees: float) -> np.ndarray:
    """Unit quaternion (w, x, y, z) rotating `degrees` about `axis`."""
    axis = np.asarray(axis, dtype=float)
    axis = axis / np.linalg.norm(axis)
    half = math.radians(degrees) / 2.0
    return np.concatenate([[math.cos(half)], math.sin(half) * axis])


def quat_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_from_euler_xyz(degrees_xyz) -> np.ndarray:
    """Quaternion of Rx(ex) then Ry(ey) then Rz(ez) (the reference's
    rotation-matrix product order for joint local rotations)."""
    ex, ey, ez = degrees_xyz
    qx = quat_from_axis_angle([1, 0, 0], ex)
    qy = quat_from_axis_angle([0, 1, 0], ey)
    qz = quat_from_axis_angle([0, 0, 1], ez)
    return quat_multiply(quat_multiply(qz, qy), qx)


def quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix of a (w, x, y, z) quaternion."""
    w, x, y, z = np.asarray(q, dtype=float) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_from_matrix(m: np.ndarray) -> np.ndarray:
    """(w, x, y, z) quaternion of a 3x3 rotation matrix (Shepperd)."""
    m = np.asarray(m, dtype=float)
    t = np.trace(m)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                         (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = math.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
    q = np.empty(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q / np.linalg.norm(q)


def decompose_matrix(mat: np.ndarray):
    """4x4 row-vector transform -> (translate[3], quat[4], scale[3]).

    Matches `Gf.Matrix4d` conventions (points are row vectors, translation
    in the last row; scale per ROW of the upper 3x3 — the reference's
    `transform_to_translate_orient_scale` takes row lengths)."""
    mat = np.asarray(mat, dtype=float)
    translate = mat[3, :3].copy()
    upper = mat[:3, :3]
    scale = np.linalg.norm(upper, axis=1)
    scale[scale == 0] = 1.0
    rot = upper / scale[:, None]
    if np.linalg.det(rot) < 0:  # reflection: flip one axis
        scale[0] *= -1
        rot = upper / scale[:, None]
    # row-vector convention: active rotation matrix is rot.T
    return translate, quat_from_matrix(rot.T), scale


def compose_matrix(translate=None, quat=None, scale=None) -> np.ndarray:
    """(t, q, s) -> 4x4 row-vector transform (v' = v @ M), Gf order
    scale-then-rotate-then-translate."""
    m = np.eye(4)
    r = np.eye(3) if quat is None else quat_to_matrix(quat)
    s = np.ones(3) if scale is None else np.asarray(scale, dtype=float)
    m[:3, :3] = (np.diag(s) @ r.T)
    if translate is not None:
        m[3, :3] = np.asarray(translate, dtype=float)
    return m


# ---------------------------------------------------------------------------
# Object model
# ---------------------------------------------------------------------------

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


class Attribute:
    """A typed attribute with a default value (no timeSamples)."""

    __slots__ = ("name", "type_name", "value", "uniform", "custom", "meta",
                 "connect")

    def __init__(self, name: str, type_name: str, value=None,
                 uniform: bool = False, custom: bool = False,
                 meta: Optional[dict] = None, connect: Optional[str] = None):
        self.name = name
        self.type_name = type_name
        self.value = value
        self.uniform = uniform
        self.custom = custom
        self.meta = meta or {}
        self.connect = connect  # source path for `<name>.connect = <path>`

    def ConnectToSource(self, source_path: str) -> bool:
        self.connect = str(source_path)
        return True

    def Get(self):
        return self.value

    def Set(self, value):
        self.value = value
        return True


class Relationship:
    __slots__ = ("name", "targets")

    def __init__(self, name: str, targets=None):
        self.name = name
        self.targets = list(targets or [])

    def SetTargets(self, targets):
        self.targets = [str(t) for t in targets]
        return True

    def AddTarget(self, target):
        self.targets.append(str(target))
        return True

    def GetTargets(self):
        return list(self.targets)


class Reference:
    """A composition reference: @asset@</prim/path> (either part optional)."""

    __slots__ = ("asset_path", "prim_path")

    def __init__(self, asset_path: str = "", prim_path: str = ""):
        self.asset_path = asset_path
        self.prim_path = prim_path

    def __repr__(self):
        return f"Reference({self.asset_path!r}, {self.prim_path!r})"

    def __eq__(self, other):
        return (isinstance(other, Reference)
                and self.asset_path == other.asset_path
                and self.prim_path == other.prim_path)


class Prim:
    def __init__(self, stage: "Stage", path: str, type_name: str = "",
                 specifier: str = "def"):
        self.stage = stage
        self.path = path
        self.type_name = type_name
        self.specifier = specifier  # 'def' | 'over' | 'class'
        self.attributes: dict[str, Attribute] = {}
        self.relationships: dict[str, Relationship] = {}
        self.children: dict[str, Prim] = {}
        self.api_schemas: list[str] = []
        self.references: list[Reference] = []
        self.metadata: dict = {}
        self.active = True

    # -- identity ----------------------------------------------------------
    @property
    def name(self) -> str:
        return self.path.rsplit("/", 1)[-1]

    def IsValid(self) -> bool:
        return True

    def GetPath(self) -> str:
        return self.path

    def GetName(self) -> str:
        return self.name

    def GetTypeName(self) -> str:
        return self.type_name

    def IsA(self, type_name: str) -> bool:
        return self.type_name == type_name

    def GetParent(self) -> Optional["Prim"]:
        if self.path == "/":
            return None
        parent = self.path.rsplit("/", 1)[0] or "/"
        return self.stage.GetPrimAtPath(parent)

    def GetChildren(self) -> list["Prim"]:
        return list(self.children.values())

    # -- attributes ----------------------------------------------------------
    def CreateAttribute(self, name: str, type_name: str, value=None,
                        uniform: bool = False, custom: bool = False
                        ) -> Attribute:
        attr = self.attributes.get(name)
        if attr is None:
            attr = Attribute(name, type_name, value, uniform, custom)
            self.attributes[name] = attr
        else:
            attr.type_name = type_name
            if value is not None:
                attr.value = value
        return attr

    def GetAttribute(self, name: str) -> Optional[Attribute]:
        return self.attributes.get(name)

    def HasAttribute(self, name: str) -> bool:
        return name in self.attributes

    # -- relationships -------------------------------------------------------
    def CreateRelationship(self, name: str) -> Relationship:
        rel = self.relationships.get(name)
        if rel is None:
            rel = Relationship(name)
            self.relationships[name] = rel
        return rel

    def GetRelationship(self, name: str) -> Optional[Relationship]:
        return self.relationships.get(name)

    # -- schemas / references -------------------------------------------------
    def ApplyAPI(self, schema: str) -> bool:
        if schema not in self.api_schemas:
            self.api_schemas.append(schema)
        return True

    def HasAPI(self, schema: str) -> bool:
        return schema in self.api_schemas

    def AddReference(self, asset_path: str = "", prim_path: str = "") -> bool:
        self.references.append(Reference(asset_path, prim_path))
        return True

    def GetReferences(self) -> list[Reference]:
        return list(self.references)

    def HasReferences(self) -> bool:
        return bool(self.references)

    def __repr__(self):
        t = self.type_name or "<untyped>"
        return f"Prim({t} {self.path!r})"


class _InvalidPrim:
    """Null object returned for missing paths (pxr-style validity checks)."""

    def IsValid(self):
        return False

    def __bool__(self):
        return False


INVALID_PRIM = _InvalidPrim()


class Stage:
    """A single-layer USD stage with `.usda` text IO."""

    def __init__(self):
        self.root: dict[str, Prim] = {}
        self.metadata: dict = {}  # defaultPrim, upAxis, metersPerUnit, ...
        self.identifier: Optional[str] = None

    # -- lifecycle -------------------------------------------------------------
    @classmethod
    def CreateNew(cls, path: str) -> "Stage":
        stage = cls()
        stage.identifier = path
        return stage

    @classmethod
    def CreateInMemory(cls) -> "Stage":
        return cls()

    @classmethod
    def Open(cls, path: str) -> "Stage":
        with open(path) as f:
            text = f.read()
        stage = parse_usda(text)
        stage.identifier = path
        return stage

    def Save(self) -> None:
        assert self.identifier, "stage has no file identifier; use Export"
        self.Export(self.identifier)

    def Export(self, path: str) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "w") as f:
            f.write(write_usda(self))

    def ExportToString(self) -> str:
        return write_usda(self)

    # -- prims ------------------------------------------------------------------
    def DefinePrim(self, path: str, type_name: str = "") -> Prim:
        path = _norm_path(path)
        parts = [p for p in path.split("/") if p]
        for p in parts:
            if not _IDENT.match(p):
                raise ValueError(f"illegal prim name {p!r} in {path!r}")
        node, cur = self.root, ""
        prim = None
        for p in parts:
            cur += "/" + p
            prim = node.get(p)
            if prim is None:
                prim = Prim(self, cur)
                node[p] = prim
            node = prim.children
        if type_name:
            prim.type_name = type_name
        return prim

    def GetPrimAtPath(self, path: str) -> Union[Prim, _InvalidPrim]:
        path = _norm_path(str(path))
        if path == "/":
            return INVALID_PRIM
        node = self.root
        prim = None
        for p in [x for x in path.split("/") if x]:
            prim = node.get(p)
            if prim is None:
                return INVALID_PRIM
            node = prim.children
        return prim

    def RemovePrim(self, path: str) -> bool:
        path = _norm_path(path)
        parent, name = path.rsplit("/", 1)
        container = (self.root if parent in ("", "/")
                     else getattr(self.GetPrimAtPath(parent), "children", None))
        if container is None or name not in container:
            return False
        del container[name]
        return True

    def Traverse(self) -> Iterator[Prim]:
        def walk(container):
            for prim in container.values():
                yield prim
                yield from walk(prim.children)
        yield from walk(self.root)

    # -- stage metadata ------------------------------------------------------
    def SetDefaultPrim(self, prim: Prim) -> None:
        self.metadata["defaultPrim"] = prim.name

    def GetDefaultPrim(self):
        name = self.metadata.get("defaultPrim")
        return self.GetPrimAtPath("/" + name) if name else INVALID_PRIM

    def SetMetadata(self, key: str, value) -> None:
        self.metadata[key] = value

    def GetMetadata(self, key: str):
        return self.metadata.get(key)


def _norm_path(path: str) -> str:
    if not path.startswith("/"):
        path = "/" + path
    while "//" in path:
        path = path.replace("//", "/")
    return path.rstrip("/") or "/"


# ---------------------------------------------------------------------------
# .usda writer
# ---------------------------------------------------------------------------

_QUOTED_META = {"defaultPrim", "upAxis", "kind", "documentation", "doc"}


def _fmt_float(x: float) -> str:
    if isinstance(x, (bool, np.bool_)):
        return "true" if x else "false"
    xf = float(x)
    if xf == int(xf) and abs(xf) < 1e16:
        return str(int(xf))
    return repr(xf)


def _fmt_value(type_name: str, v) -> str:
    base = type_name.rstrip("[]")
    is_array = type_name.endswith("[]")
    if is_array:
        items = [_fmt_value(base, x) for x in _aslist(v)]
        return "[" + ", ".join(items) + "]"
    if base in ("token", "string"):
        return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'
    if base == "asset":
        return "@" + str(v) + "@"
    if base == "bool":
        return "true" if v else "false"
    if base in ("int", "uint", "int64", "uint64"):
        return str(int(v))
    if base in ("float", "double", "half"):
        return _fmt_float(v)
    if base in ("matrix4d", "matrix3d"):
        rows = np.asarray(v, dtype=float)
        return ("( " + ", ".join(
            "(" + ", ".join(_fmt_float(x) for x in row) + ")"
            for row in rows) + " )")
    # vector-like: float3, double3, point3f, normal3f, color3f, quatf, ...
    seq = np.asarray(v, dtype=float).reshape(-1)
    return "(" + ", ".join(_fmt_float(x) for x in seq) + ")"


def _aslist(v):
    if isinstance(v, np.ndarray):
        return v.tolist() if v.ndim == 1 else [row for row in v]
    return list(v)


def _fmt_meta_value(key: str, v) -> str:
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _fmt_float(v)
    if isinstance(v, dict):
        inner = "; ".join(f"{k} = {_fmt_meta_value(k, x)}" for k, x in v.items())
        return "{ " + inner + " }"
    raise TypeError(f"unserializable metadata {key}={v!r}")


def _prim_meta_lines(prim: Prim) -> list[str]:
    lines = []
    if prim.api_schemas:
        names = ", ".join(f'"{s}"' for s in prim.api_schemas)
        lines.append(f"prepend apiSchemas = [{names}]")
    if prim.references:
        refs = []
        for r in prim.references:
            s = ""
            if r.asset_path:
                s += f"@{r.asset_path}@"
            if r.prim_path:
                s += f"<{r.prim_path}>"
            refs.append(s)
        if len(refs) == 1:
            lines.append(f"prepend references = {refs[0]}")
        else:
            lines.append("prepend references = [" + ", ".join(refs) + "]")
    if not prim.active:
        lines.append("active = false")
    for k, v in prim.metadata.items():
        lines.append(f"{k} = {_fmt_meta_value(k, v)}")
    return lines


def write_usda(stage: Stage) -> str:
    out = ["#usda 1.0"]
    if stage.metadata:
        out.append("(")
        for k, v in stage.metadata.items():
            out.append(f"    {k} = {_fmt_meta_value(k, v)}")
        out.append(")")
    out.append("")

    def emit(prim: Prim, indent: int):
        pad = "    " * indent
        name = f'"{prim.name}"'
        head = (f"{prim.specifier} {prim.type_name} {name}"
                if prim.type_name else f"{prim.specifier} {name}")
        meta = _prim_meta_lines(prim)
        if meta:
            out.append(f"{pad}{head} (")
            for line in meta:
                out.append(f"{pad}    {line}")
            out.append(f"{pad})")
        else:
            out.append(f"{pad}{head}")
        out.append(f"{pad}{{")
        body_pad = pad + "    "
        for attr in prim.attributes.values():
            decl = ""
            if attr.custom:
                decl += "custom "
            if attr.uniform:
                decl += "uniform "
            decl += f"{attr.type_name} {attr.name}"
            if attr.value is not None:
                decl += f" = {_fmt_value(attr.type_name, attr.value)}"
            if attr.meta:
                inner = "; ".join(f"{k} = {_fmt_meta_value(k, v)}"
                                  for k, v in attr.meta.items())
                decl += f" ({inner})"
            out.append(f"{body_pad}{decl}")
            if attr.connect:
                # official connection syntax: `<type> <name>.connect = <path>`
                out.append(f"{body_pad}{attr.type_name} {attr.name}.connect = "
                           f"<{attr.connect}>")
        for rel in prim.relationships.values():
            if len(rel.targets) == 1:
                out.append(f"{body_pad}rel {rel.name} = <{rel.targets[0]}>")
            else:
                tgts = ", ".join(f"<{t}>" for t in rel.targets)
                out.append(f"{body_pad}rel {rel.name} = [{tgts}]")
        if (prim.attributes or prim.relationships) and prim.children:
            out.append("")
        for i, child in enumerate(prim.children.values()):
            if i:
                out.append("")
            emit(child, indent + 1)
        out.append(f"{pad}}}")

    for i, prim in enumerate(stage.root.values()):
        if i:
            out.append("")
        emit(prim, 0)
    out.append("")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# .usda parser (subset: prims, attributes, rels, references, apiSchemas)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s+
  | \#[^\n]*                                  # comments
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<asset>@[^@]*@)
  | (?P<path><[^>]*>)
  | (?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_:.]*)
  | (?P<punct>[()\[\]{}=,;])
""", re.VERBOSE)


def _tokenize(text: str):
    pos, n = 0, len(text)
    if text.startswith("#usda"):
        pos = text.find("\n") + 1
    toks = []
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"usda parse error at {text[pos:pos+40]!r}")
        pos = m.end()
        for kind in ("str", "asset", "path", "num", "ident", "punct"):
            val = m.group(kind)
            if val is not None:
                toks.append((kind, val))
                break
    return toks


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, val):
        kind, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")
        return v

    # -- values ---------------------------------------------------------------
    def parse_value(self):
        kind, v = self.peek()
        if v == "(":
            self.next()
            items = []
            while self.peek()[1] != ")":
                items.append(self.parse_value())
                if self.peek()[1] == ",":
                    self.next()
            self.next()
            return tuple(items)
        if v == "[":
            self.next()
            items = []
            while self.peek()[1] != "]":
                items.append(self.parse_value())
                if self.peek()[1] == ",":
                    self.next()
            self.next()
            return items
        if v == "{":  # dict metadata value
            self.next()
            d = {}
            while self.peek()[1] != "}":
                key = self.next()[1]
                self.expect("=")
                d[key] = self.parse_value()
                if self.peek()[1] in (";", ","):
                    self.next()
            self.next()
            return d
        self.next()
        if kind == "str":
            return v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if kind == "asset":
            ref = Reference(v[1:-1])
            if self.peek()[0] == "path":  # @asset@</prim>
                ref.prim_path = self.next()[1][1:-1]
            return ref
        if kind == "path":
            return v[1:-1]
        if kind == "num":
            f = float(v)
            return int(f) if f == int(f) and "." not in v and "e" not in v.lower() else f
        if v == "true":
            return True
        if v == "false":
            return False
        if v == "None":
            return None
        return v  # bare token

    # -- prim metadata ----------------------------------------------------------
    def parse_paren_meta(self, prim: Optional[Prim], stage: Stage):
        self.expect("(")
        target = prim.metadata if prim is not None else stage.metadata
        while self.peek()[1] != ")":
            kind, key = self.next()
            if key in ("prepend", "append", "add", "delete"):
                kind, key = self.next()
            self.expect("=")
            val = self.parse_value()
            if prim is not None and key == "apiSchemas":
                prim.api_schemas = list(val)
            elif prim is not None and key == "references":
                refs = val if isinstance(val, list) else [val]
                for r in refs:
                    if isinstance(r, Reference):
                        prim.references.append(r)
                    elif isinstance(r, str):  # bare </path> reference
                        prim.references.append(Reference("", r))
            elif prim is not None and key == "active":
                prim.active = bool(val)
            else:
                target[key] = val
            if self.peek()[1] in (";", ","):
                self.next()
        self.expect(")")

    # -- prims ------------------------------------------------------------------
    def parse_prim(self, stage: Stage, parent_path: str):
        specifier = self.next()[1]  # def / over / class
        kind, v = self.peek()
        type_name = ""
        if kind == "ident":
            type_name = self.next()[1]
        name = self.next()[1]
        if name.startswith('"'):
            name = name[1:-1]
        path = (parent_path.rstrip("/") or "") + "/" + name
        prim = stage.DefinePrim(path, type_name)
        prim.specifier = specifier
        if self.peek()[1] == "(":
            self.parse_paren_meta(prim, stage)
        self.expect("{")
        while self.peek()[1] != "}":
            self.parse_statement(stage, prim)
        self.expect("}")

    def parse_statement(self, stage: Stage, prim: Prim):
        kind, v = self.peek()
        if v in ("def", "over", "class") and self.peek(1)[0] in ("ident", "str"):
            self.parse_prim(stage, prim.path)
            return
        # attribute / rel decl
        uniform = custom = False
        while self.peek()[1] in ("custom", "uniform", "prepend", "append",
                                 "add", "delete", "varying"):
            v = self.next()[1]
            uniform |= v == "uniform"
            custom |= v == "custom"
        kind, v = self.next()
        if v == "rel":
            name = self.next()[1]
            rel = prim.CreateRelationship(name)
            if self.peek()[1] == "=":
                self.next()
                val = self.parse_value()
                rel.SetTargets(val if isinstance(val, list) else [val])
            if self.peek()[1] == "(":
                self._skip_parens()
            return
        type_name = v
        if self.peek()[1] == "[" and self.peek(1)[1] == "]":
            self.next(), self.next()
            type_name += "[]"
        name = self.next()[1]
        if name.endswith(".connect"):
            # connection statement: attach to the base attribute
            attr = prim.CreateAttribute(name[: -len(".connect")], type_name,
                                        uniform=uniform, custom=custom)
            if self.peek()[1] == "=":
                self.next()
                tgt = self.parse_value()
                attr.connect = (tgt[0] if isinstance(tgt, list) and tgt
                                else tgt)
            return
        attr = prim.CreateAttribute(name, type_name, uniform=uniform,
                                    custom=custom)
        if self.peek()[1] == "=":
            self.next()
            attr.value = self._coerce(type_name, self.parse_value())
        if self.peek()[1] == "(":
            # attribute metadata: parse into attr.meta (round-trip safe)
            self.next()
            while self.peek()[1] != ")":
                kind, key = self.next()
                if key in ("prepend", "append", "add", "delete"):
                    kind, key = self.next()
                self.expect("=")
                attr.meta[key] = self.parse_value()
                if self.peek()[1] in (";", ","):
                    self.next()
            self.expect(")")

    def _skip_parens(self):
        depth = 0
        while True:
            v = self.next()[1]
            if v == "(":
                depth += 1
            elif v == ")":
                depth -= 1
                if depth == 0:
                    return

    @staticmethod
    def _coerce(type_name: str, value):
        base = type_name.rstrip("[]")
        if base == "asset":
            # @path@ tokens parse as Reference; an asset ATTRIBUTE is just
            # the path string
            fix = lambda v: v.asset_path if isinstance(v, Reference) else v
            return ([fix(v) for v in value] if isinstance(value, list)
                    else fix(value))
        if base in ("float", "double", "half") and not type_name.endswith("[]"):
            return float(value) if not isinstance(value, (tuple, list)) else value
        return value

    def parse_stage(self) -> Stage:
        stage = Stage()
        if self.peek()[1] == "(":
            self.parse_paren_meta(None, stage)
        while self.peek()[0] != "eof":
            self.parse_prim(stage, "")
        return stage


def parse_usda(text: str) -> Stage:
    return _Parser(_tokenize(text)).parse_stage()


# ---------------------------------------------------------------------------
# Xformable helpers (UsdGeom.Xformable equivalent)
# ---------------------------------------------------------------------------

_OP_TYPES = {
    "xformOp:translate": ("double3", 3),
    "xformOp:orient": ("quatf", 4),
    "xformOp:scale": ("double3", 3),
    "xformOp:rotateX": ("double", 1),
    "xformOp:rotateY": ("double", 1),
    "xformOp:rotateZ": ("double", 1),
    "xformOp:rotateXYZ": ("double3", 3),
    "xformOp:transform": ("matrix4d", 16),
}

XFORMABLE_TYPES = {
    "Xform", "Mesh", "Scope", "Sphere", "Cube", "Capsule", "Cylinder",
    "Cone", "Points", "BasisCurves", "Camera", "",
}


class Xformable:
    """xformOp accessor for a prim (UsdGeom.Xformable equivalent).

    Falsy for prims whose type can't carry transforms, mirroring
    ``UsdGeom.Xformable(prim)`` validity semantics."""

    def __init__(self, prim: Prim):
        self.prim = prim

    def __bool__(self):
        return (self.prim.type_name in XFORMABLE_TYPES
                or self.prim.type_name.endswith("Joint"))

    # -- op management -----------------------------------------------------
    def _order(self) -> list[str]:
        attr = self.prim.GetAttribute("xformOpOrder")
        return list(attr.value) if attr and attr.value else []

    def _set_order(self, order: list[str]) -> None:
        self.prim.CreateAttribute("xformOpOrder", "token[]", list(order),
                                  uniform=True)

    def ClearXformOpOrder(self) -> None:
        for op in self._order():
            self.prim.attributes.pop(op, None)
        self._set_order([])

    def _add_op(self, op_name: str, type_name: str, value) -> Attribute:
        attr = self.prim.CreateAttribute(op_name, type_name, value)
        order = self._order()
        if op_name not in order:
            order.append(op_name)
            self._set_order(order)
        return attr

    def AddTranslateOp(self, value=(0.0, 0.0, 0.0), precision="double"):
        t = "double3" if precision == "double" else "float3"
        return self._add_op("xformOp:translate", t, tuple(value))

    def AddOrientOp(self, value=(1.0, 0.0, 0.0, 0.0), precision="float"):
        t = "quatf" if precision == "float" else "quatd"
        return self._add_op("xformOp:orient", t, tuple(value))

    def AddScaleOp(self, value=(1.0, 1.0, 1.0), precision="float"):
        t = "float3" if precision == "float" else "double3"
        return self._add_op("xformOp:scale", t, tuple(value))

    def AddRotateXOp(self, value=0.0):
        return self._add_op("xformOp:rotateX", "float", float(value))

    def AddRotateXYZOp(self, value=(0.0, 0.0, 0.0), precision="float"):
        t = "float3" if precision == "float" else "double3"
        return self._add_op("xformOp:rotateXYZ", t, tuple(value))

    def AddTransformOp(self, value=None):
        v = np.eye(4) if value is None else np.asarray(value, dtype=float)
        return self._add_op("xformOp:transform", "matrix4d", v)

    def GetTranslateOp(self) -> Optional[Attribute]:
        return self.prim.GetAttribute("xformOp:translate")

    # -- evaluation ------------------------------------------------------------
    def GetLocalTransformation(self) -> np.ndarray:
        """Compose this prim's op stack into a 4x4 row-vector matrix
        (ops apply right-to-left, as in UsdGeom)."""
        m = np.eye(4)
        for op in self._order():
            attr = self.prim.GetAttribute(op)
            if attr is None or attr.value is None:
                continue
            v = attr.value
            if op.startswith("xformOp:translate"):
                om = compose_matrix(translate=v)
            elif op.startswith("xformOp:orient"):
                om = compose_matrix(quat=np.asarray(v, dtype=float))
            elif op.startswith("xformOp:scale"):
                om = compose_matrix(scale=v)
            elif op.startswith("xformOp:rotateXYZ"):
                om = compose_matrix(quat=quat_from_euler_xyz(v))
            elif op.startswith("xformOp:rotateX"):
                om = compose_matrix(quat=quat_from_axis_angle([1, 0, 0], v))
            elif op.startswith("xformOp:rotateY"):
                om = compose_matrix(quat=quat_from_axis_angle([0, 1, 0], v))
            elif op.startswith("xformOp:rotateZ"):
                om = compose_matrix(quat=quat_from_axis_angle([0, 0, 1], v))
            elif op.startswith("xformOp:transform"):
                om = np.asarray(v, dtype=float).reshape(4, 4)
            else:
                continue
            m = om @ m  # row-vector convention: later ops left-multiply
        return m
