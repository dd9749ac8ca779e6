"""CAD -> USD robot-asset conversion.

Parity counterpart of reference `src/utils/step_to_usd.py:1-425` (same YAML
config schema, same stage structure, same CLI), re-implemented on the
dependency-free `tools/usdlite.py` scene graph instead of `pxr`.

Geometry backends:
- **STEP** (`.step`/`.stp`): requires `pythonocc-core` for B-rep
  tessellation, exactly as the reference does (`BRepMesh_IncrementalMesh`).
  Used when importable; otherwise a clear error tells the user to convert
  to STL/OBJ first (FreeCAD/OCC one-liner) — the tessellator is the only
  OCC-bound stage.
- **STL** (binary or ASCII) and **OBJ**: parsed natively (numpy). Each
  file's connected shells (STL `solid` blocks / OBJ `o`-objects) become the
  `solid_{i}` prims, matching the reference's per-TopAbs_SOLID traversal.

Authored stage structure (identical to the reference's):
  /Model (Xform, defaultPrim, ArticulationRootAPI, TRS ops)
    /Model/Looks (Scope) + OmniPBR material `material_191919`
    /Model/solid_i (Xform, TRS) -> /visual (Mesh, material-bound)
                                -> /collision (Mesh, guide purpose,
                                   CollisionAPI + meshSimplification)
                                -> prismatic joints from config
  /physicsScene (gravity -Y, 981 cm/s^2)
Units: input meters are divided by 100 with metersPerUnit=0.01 and Y-up,
mirroring the reference's manual conversion (`:357-360`).
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import usdlite as U  # noqa: E402
from usdlite import Stage, Xformable  # noqa: E402


# ---------------------------------------------------------------------------
# Config (reference step_to_usd.py:15-139)
# ---------------------------------------------------------------------------

def validate_config(config):
    """Validate the conversion config (reference `:15-65`)."""
    if not isinstance(config, dict):
        return False, "Configuration must be a dictionary"
    if "solids" in config:
        if not isinstance(config["solids"], dict):
            return False, "'solids' must be a dictionary"
        for name, sc in config["solids"].items():
            if not isinstance(sc, dict):
                return False, f"Configuration for solid '{name}' must be a dictionary"
            for flag in ["convert", "visuals", "collisions"]:
                if flag in sc and not isinstance(sc[flag], bool):
                    return False, f"'{flag}' flag for solid '{name}' must be a boolean"
            if "joint" in sc and not isinstance(sc["joint"], dict):
                return False, f"'joint' for solid '{name}' must be a dictionary"
    return True, "Configuration is valid"


def load_conversion_config(config_path):
    if not config_path:
        return None
    if not os.path.exists(config_path):
        print(f"Warning: Config file {config_path} not found")
        return None
    try:
        with open(config_path) as f:
            config = yaml.safe_load(f)
        ok, msg = validate_config(config)
        if not ok:
            print(f"Error: Invalid configuration - {msg}")
            return None
        print(f"Loaded conversion configuration from {config_path}")
        return config
    except yaml.YAMLError as e:
        print(f"Error parsing YAML config: {e}")
        return None


def should_convert_solid(solid_name, config):
    """Default convert-all; the config can opt individual solids out
    (reference `:106-126`)."""
    if not config or "solids" not in config:
        return True
    sc = config["solids"].get(solid_name)
    if sc is None:
        return config.get("convert_unlisted", True)
    return sc.get("convert", True)


def get_solid_config(solid_name, config):
    if not config or "solids" not in config:
        return {}
    return config["solids"].get(solid_name, {})


# ---------------------------------------------------------------------------
# Native mesh parsers (STL / OBJ)
# ---------------------------------------------------------------------------

def _read_stl(path):
    """Return [(name, vertices[N,3], faces[M*3])] — one entry per `solid`
    block (ASCII) or one for the whole file (binary)."""
    with open(path, "rb") as f:
        head = f.read(5)
    if head == b"solid":
        # could still be binary with a 'solid' header; sniff for 'facet'
        with open(path, "rb") as f:
            sample = f.read(4096)
        if b"facet" in sample:
            return _read_stl_ascii(path)
    return [_read_stl_binary(path)]


def _read_stl_binary(path):
    with open(path, "rb") as f:
        f.read(80)
        (n,) = struct.unpack("<I", f.read(4))
        data = np.frombuffer(f.read(n * 50), dtype=np.uint8).reshape(n, 50)
    tris = data[:, 12:48].copy().view("<f4").reshape(n, 3, 3)
    verts, faces = _dedupe_vertices(tris.reshape(-1, 3))
    return os.path.splitext(os.path.basename(path))[0], verts, faces


def _read_stl_ascii(path):
    solids = []
    name, tri_pts = None, []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "solid":
                name = parts[1] if len(parts) > 1 else f"solid_{len(solids)}"
                tri_pts = []
            elif parts[0] == "vertex":
                tri_pts.append([float(parts[1]), float(parts[2]),
                                float(parts[3])])
            elif parts[0] == "endsolid":
                pts = np.asarray(tri_pts, dtype=np.float64).reshape(-1, 3)
                verts, faces = _dedupe_vertices(pts)
                solids.append((name, verts, faces))
    return solids


def _dedupe_vertices(points):
    """Collapse duplicated triangle-soup vertices into an indexed mesh."""
    verts, inverse = np.unique(points.round(9), axis=0, return_inverse=True)
    return verts, inverse.astype(np.int64).tolist()


def _read_obj(path):
    """Return [(name, vertices, faces)] per `o` object (or one unnamed)."""
    all_v = []
    objects = []  # (name, face index triples into all_v)
    cur_name, cur_faces = None, []

    def flush():
        nonlocal cur_faces
        if cur_faces:
            objects.append((cur_name or f"solid_{len(objects)}",
                            list(cur_faces)))
        cur_faces = []

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "v":
                all_v.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "o":
                flush()
                cur_name = parts[1] if len(parts) > 1 else None
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for i in range(1, len(idx) - 1):  # fan-triangulate
                    cur_faces.extend([idx[0], idx[i], idx[i + 1]])
    flush()
    all_v = np.asarray(all_v, dtype=np.float64)
    out = []
    for name, faces in objects:
        used = sorted(set(faces))
        remap = {g: l for l, g in enumerate(used)}
        out.append((name, all_v[used], [remap[g] for g in faces]))
    return out


def _read_step_occ(path, linear_deflection, angular_deflection):
    """Tessellate a STEP file with pythonocc (the reference's exact recipe,
    `:280-296` + the per-solid face loop `:341-382`)."""
    from OCC.Core.BRep import BRep_Tool
    from OCC.Core.BRepMesh import BRepMesh_IncrementalMesh
    from OCC.Core.IFSelect import IFSelect_RetDone
    from OCC.Core.STEPControl import STEPControl_Reader
    from OCC.Core.TopAbs import TopAbs_FACE, TopAbs_SOLID
    from OCC.Core.TopExp import TopExp_Explorer
    from OCC.Core.TopoDS import topods

    reader = STEPControl_Reader()
    if reader.ReadFile(path) != IFSelect_RetDone:
        raise RuntimeError("Cannot read STEP file")
    reader.TransferRoots()
    shape = reader.Shape()
    BRepMesh_IncrementalMesh(shape, linear_deflection, False,
                             angular_deflection, True).Perform()
    solids = []
    exp = TopExp_Explorer(shape, TopAbs_SOLID)
    while exp.More():
        solid = topods.Solid(exp.Current())
        verts, faces, off = [], [], 0
        fexp = TopExp_Explorer(solid, TopAbs_FACE)
        while fexp.More():
            face = topods.Face(fexp.Current())
            tri = BRep_Tool.Triangulation(face, face.Location())
            if tri is not None:
                for i in range(1, tri.NbNodes() + 1):
                    p = tri.Node(i)
                    verts.append([p.X(), p.Y(), p.Z()])
                for i in range(1, tri.NbTriangles() + 1):
                    t = tri.Triangle(i)
                    faces.extend([t.Value(j) - 1 + off for j in (1, 2, 3)])
                off += tri.NbNodes()
            fexp.Next()
        solids.append((None, np.asarray(verts, dtype=np.float64), faces))
        exp.Next()
    return solids


def load_solids(path, linear_deflection=0.1, angular_deflection=0.5):
    """Dispatch on extension; returns [(name_or_None, verts, faces)]."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".step", ".stp"):
        try:
            import OCC.Core.STEPControl  # noqa: F401
        except ImportError:
            raise SystemExit(
                "STEP tessellation requires pythonocc-core, which is not "
                "installed. Convert the CAD file to STL/OBJ first (e.g. "
                "FreeCAD: Mesh.export, or `occ` CLI) and re-run on that — "
                "the USD-authoring path is identical.")
        return _read_step_occ(path, linear_deflection, angular_deflection)
    if ext == ".stl":
        return _read_stl(path)
    if ext == ".obj":
        return _read_obj(path)
    raise SystemExit(f"Unsupported geometry format '{ext}' "
                     "(expected .step/.stp/.stl/.obj)")


# ---------------------------------------------------------------------------
# USD authoring (reference `:141-273`)
# ---------------------------------------------------------------------------

def _add_trs(prim):
    xf = Xformable(prim)
    xf.AddTranslateOp((0.0, 0.0, 0.0))
    xf.AddRotateXYZOp((0.0, 0.0, 0.0))
    xf.AddScaleOp((1.0, 1.0, 1.0))
    return xf


def create_solid_xform(stage, solid_name, parent_path="/Model"):
    xform = stage.DefinePrim(f"{parent_path}/{solid_name}", "Xform")
    _add_trs(xform)
    return xform


def create_material(stage, material_path="/Model/Looks/material_191919"):
    """OmniPBR MDL material (reference `:153-176`)."""
    material = stage.DefinePrim(material_path, "Material")
    shader = stage.DefinePrim(material_path + "/Shader", "Shader")
    shader.CreateAttribute("info:implementationSource", "token",
                           "sourceAsset", uniform=True)
    shader.CreateAttribute("info:mdl:sourceAsset", "asset", "OmniPBR.mdl",
                           uniform=True)
    shader.CreateAttribute("info:mdl:sourceAsset:subIdentifier", "token",
                           "OmniPBR", uniform=True)
    shader.CreateAttribute("outputs:out", "token")
    for port in ("surface", "displacement", "volume"):
        a = material.CreateAttribute(f"outputs:mdl:{port}", "token")
        a.ConnectToSource(f"{material_path}/Shader.outputs:out")
    return material


def _author_mesh(stage, mesh_path, vertices, faces):
    mesh = stage.DefinePrim(mesh_path, "Mesh")
    _add_trs(mesh)
    pts = [tuple(float(x) for x in v) for v in np.asarray(vertices)]
    mesh.CreateAttribute("points", "point3f[]", pts)
    mesh.CreateAttribute("faceVertexCounts", "int[]", [3] * (len(faces) // 3))
    mesh.CreateAttribute("faceVertexIndices", "int[]",
                         [int(i) for i in faces])
    mesh.CreateAttribute("subdivisionScheme", "token", "none", uniform=True)
    return mesh


def create_visual_mesh(stage, solid_name, vertices, faces,
                       parent_path="/Model"):
    mesh = _author_mesh(stage, f"{parent_path}/{solid_name}/visual",
                        vertices, faces)
    material_path = "/Model/Looks/material_191919"
    if not stage.GetPrimAtPath(material_path):
        create_material(stage)
    mesh.ApplyAPI("MaterialBindingAPI")
    mesh.CreateRelationship("material:binding").SetTargets([material_path])
    return mesh


def create_collision_mesh(stage, solid_name, vertices, faces,
                          parent_path="/Model"):
    mesh = _author_mesh(stage, f"{parent_path}/{solid_name}/collision",
                        vertices, faces)
    mesh.ApplyAPI("PhysicsCollisionAPI")
    mesh.CreateAttribute("physics:collisionEnabled", "bool", True)
    mesh.ApplyAPI("PhysicsMeshCollisionAPI")
    mesh.CreateAttribute("physics:approximation", "token",
                         "meshSimplification", uniform=True)
    mesh.CreateAttribute("purpose", "token", "guide", uniform=True)
    return mesh


def create_prismatic_joint(stage, joint_config, solid_name,
                           parent_path="/Model"):
    if not joint_config or "body0" not in joint_config or "body1" not in joint_config:
        return None
    joint_name = joint_config.get("name", "PrismaticJoint")
    joint = stage.DefinePrim(f"{parent_path}/{solid_name}/{joint_name}",
                             "PhysicsPrismaticJoint")
    joint.CreateRelationship("physics:body0").SetTargets(
        [f"{parent_path}/solid_{joint_config['body0']}"])
    joint.CreateRelationship("physics:body1").SetTargets(
        [f"{parent_path}/solid_{joint_config['body1']}"])
    return joint


# ---------------------------------------------------------------------------
# Driver (reference `:275-411`)
# ---------------------------------------------------------------------------

def step_to_usd(step_path, usd_path, config_path=None, linear_deflection=0.1,
                angular_deflection=0.5):
    config = load_conversion_config(config_path) if config_path else None
    solids = load_solids(step_path, linear_deflection, angular_deflection)

    stage = Stage.CreateNew(usd_path)
    stage.SetMetadata("defaultPrim", "Model")
    stage.SetMetadata("upAxis", "Y")
    stage.SetMetadata("metersPerUnit", 0.01)

    model_root = stage.DefinePrim("/Model", "Xform")
    _add_trs(model_root)
    model_root.ApplyAPI("PhysicsArticulationRootAPI")
    print("Applied ArticulationRootAPI to Model prim")

    physics_scene = stage.DefinePrim("/physicsScene", "PhysicsScene")
    physics_scene.CreateAttribute("physics:gravityDirection", "vector3f",
                                  (0.0, -1.0, 0.0))
    physics_scene.CreateAttribute("physics:gravityMagnitude", "float", 981.0)

    stage.DefinePrim("/Model/Looks", "Scope")

    converted = 0
    for idx, (_, verts, faces) in enumerate(solids):
        solid_name = f"solid_{idx}"
        if not should_convert_solid(solid_name, config):
            continue
        if len(verts) == 0 or len(faces) == 0:
            continue
        sc = get_solid_config(solid_name, config)
        # manual meters -> centimeters (reference `:357-360`)
        verts_cm = np.asarray(verts, dtype=np.float64) / 100.0
        create_solid_xform(stage, solid_name)
        if sc.get("visuals", True):
            create_visual_mesh(stage, solid_name, verts_cm, faces)
        if sc.get("collisions", False):
            create_collision_mesh(stage, solid_name, verts_cm, faces)
        if "joint" in sc:
            create_prismatic_joint(stage, sc["joint"], solid_name)
        converted += 1

    stage.Save()
    if converted:
        print(f"Converted {step_path} to {usd_path} with {converted} solid "
              f"meshes (out of {len(solids)} total solids)")
    else:
        print(f"No solids were converted from {step_path} to {usd_path}")
    return stage


if __name__ == "__main__":
    if len(sys.argv) not in (4, 5):
        print("Usage: python step_to_usd.py base_dir input.{step,stl,obj} "
              "output.usda [config.yaml]")
        sys.exit(1)
    base_dir = sys.argv[1]
    input_file = os.path.join(base_dir, sys.argv[2])
    output_file = os.path.join(base_dir, sys.argv[3])
    config_path = os.path.join(base_dir, sys.argv[4]) if len(sys.argv) == 5 else None
    if not os.path.exists(input_file):
        print(f"Error: Input file {input_file} does not exist")
        sys.exit(1)
    d = os.path.dirname(output_file)
    if d:
        os.makedirs(d, exist_ok=True)
    step_to_usd(input_file, output_file, config_path)
