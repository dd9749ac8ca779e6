"""Tests for the dependency-free USD stack (`tools/usdlite.py`) and the two
robot-asset tools built on it (`tools/step_to_usd.py`,
`tools/usd_modification.py` — parity counterparts of reference
`src/utils/step_to_usd.py` / `usd_modification.py`)."""

import math
import os
import struct
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tools"))

import step_to_usd as s2u  # noqa: E402
import usd_modification as um  # noqa: E402
import usdlite as U  # noqa: E402


# ---------------------------------------------------------------------------
# usdlite core: math
# ---------------------------------------------------------------------------

def test_quat_matrix_roundtrip():
    rs = np.random.RandomState(0)
    for _ in range(20):
        axis = rs.randn(3)
        q = U.quat_from_axis_angle(axis, rs.uniform(-180, 180))
        m = U.quat_to_matrix(q)
        q2 = U.quat_from_matrix(m)
        # q and -q are the same rotation
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-9)


def test_decompose_compose_roundtrip():
    rs = np.random.RandomState(1)
    for _ in range(20):
        t = rs.randn(3)
        q = U.quat_from_axis_angle(rs.randn(3), rs.uniform(-180, 180))
        s = rs.uniform(0.2, 3.0, 3)
        m = U.compose_matrix(t, q, s)
        t2, q2, s2 = U.decompose_matrix(m)
        np.testing.assert_allclose(t, t2, atol=1e-9)
        np.testing.assert_allclose(s, s2, atol=1e-9)
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-8)


def test_euler_xyz_quat_matches_matrix_product():
    # the reference composes Rx then Ry then Rz as matrices; our quat
    # product must equal that composition
    deg = (31.0, -47.0, 112.0)
    q = U.quat_from_euler_xyz(deg)
    rx = U.quat_to_matrix(U.quat_from_axis_angle([1, 0, 0], deg[0]))
    ry = U.quat_to_matrix(U.quat_from_axis_angle([0, 1, 0], deg[1]))
    rz = U.quat_to_matrix(U.quat_from_axis_angle([0, 0, 1], deg[2]))
    np.testing.assert_allclose(U.quat_to_matrix(q), rz @ ry @ rx, atol=1e-12)


def test_xformable_local_transformation_trs_order():
    st = U.Stage.CreateInMemory()
    p = st.DefinePrim("/a", "Xform")
    xf = U.Xformable(p)
    xf.AddTranslateOp((1.0, 2.0, 3.0))
    xf.AddOrientOp(tuple(U.quat_from_axis_angle([0, 0, 1], 90.0)))
    xf.AddScaleOp((2.0, 2.0, 2.0))
    m = xf.GetLocalTransformation()
    # ops apply right-to-left: scale, then rotate, then translate
    v = np.array([1.0, 0.0, 0.0, 1.0]) @ m
    np.testing.assert_allclose(v[:3], [1.0, 4.0, 3.0], atol=1e-12)


# ---------------------------------------------------------------------------
# usdlite: .usda write / parse round-trip
# ---------------------------------------------------------------------------

def _build_scene():
    st = U.Stage.CreateInMemory()
    st.SetMetadata("defaultPrim", "Model")
    st.SetMetadata("upAxis", "Y")
    st.SetMetadata("metersPerUnit", 0.01)
    model = st.DefinePrim("/Model", "Xform")
    model.ApplyAPI("PhysicsArticulationRootAPI")
    U.Xformable(model).AddTranslateOp((0.5, -1.25, 2.0))
    mesh = st.DefinePrim("/Model/part/visual", "Mesh")
    st.GetPrimAtPath("/Model/part").type_name = "Xform"
    mesh.CreateAttribute("points", "point3f[]",
                         [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.5)])
    mesh.CreateAttribute("faceVertexCounts", "int[]", [3])
    mesh.CreateAttribute("faceVertexIndices", "int[]", [0, 1, 2])
    mesh.CreateAttribute("subdivisionScheme", "token", "none", uniform=True)
    mesh.CreateRelationship("material:binding").SetTargets(
        ["/Model/Looks/material_191919"])
    joint = st.DefinePrim("/Model/part/Joint", "PhysicsPrismaticJoint")
    joint.CreateRelationship("physics:body0").SetTargets(["/Model/part"])
    joint.CreateRelationship("physics:body1").SetTargets(["/Model/other"])
    joint.CreateAttribute("physics:localRot0", "quatf", (1.0, 0.0, 0.0, 0.0))
    joint.CreateAttribute("physics:lowerLimit", "float", -0.35)
    ref = st.DefinePrim("/Model/sub", "Xform")
    ref.AddReference("./asset.usd", "/Root")
    return st


def test_usda_roundtrip():
    st = _build_scene()
    text = st.ExportToString()
    assert text.startswith("#usda 1.0")
    st2 = U.parse_usda(text)
    assert st2.GetMetadata("defaultPrim") == "Model"
    assert st2.GetMetadata("metersPerUnit") == 0.01
    model = st2.GetPrimAtPath("/Model")
    assert model.IsValid() and model.HasAPI("PhysicsArticulationRootAPI")
    np.testing.assert_allclose(
        model.GetAttribute("xformOp:translate").Get(), (0.5, -1.25, 2.0))
    mesh = st2.GetPrimAtPath("/Model/part/visual")
    assert mesh.GetTypeName() == "Mesh"
    pts = np.asarray(mesh.GetAttribute("points").Get(), dtype=float)
    np.testing.assert_allclose(pts, [(0, 0, 0), (1, 0, 0), (0, 1, 0.5)])
    assert mesh.GetAttribute("faceVertexIndices").Get() == [0, 1, 2]
    assert (mesh.GetRelationship("material:binding").GetTargets()
            == ["/Model/Looks/material_191919"])
    joint = st2.GetPrimAtPath("/Model/part/Joint")
    assert joint.GetAttribute("physics:lowerLimit").Get() == pytest.approx(-0.35)
    ref = st2.GetPrimAtPath("/Model/sub")
    assert ref.GetReferences() == [U.Reference("./asset.usd", "/Root")]
    # second round-trip is textually stable (canonical form)
    assert U.parse_usda(text).ExportToString() == text


def test_parse_external_style_usda():
    # hand-written file with constructs our writer doesn't emit in this
    # order/style (metadata comments, over, attribute metadata parens)
    text = '''#usda 1.0
(
    defaultPrim = "World"
    upAxis = "Z"
)

def Xform "World" (
    kind = "assembly"
)
{
    double3 xformOp:translate = (0, 0, 10)
    uniform token[] xformOpOrder = ["xformOp:translate"]

    def Mesh "m" {
        int[] faceVertexCounts = [3, 3]
        point3f[] points = [(0,0,0), (1,0,0), (1,1,0), (0,1,0)]
        float weight = 0.5 (documentation = "blend")
    }

    over "late" {
        custom bool flag = true
    }
}
'''
    st = U.parse_usda(text)
    w = st.GetPrimAtPath("/World")
    assert w.metadata["kind"] == "assembly"
    m = st.GetPrimAtPath("/World/m")
    assert m.GetAttribute("faceVertexCounts").Get() == [3, 3]
    assert len(m.GetAttribute("points").Get()) == 4
    assert m.GetAttribute("weight").Get() == pytest.approx(0.5)
    late = st.GetPrimAtPath("/World/late")
    assert late.specifier == "over"
    assert late.GetAttribute("flag").Get() is True


# ---------------------------------------------------------------------------
# step_to_usd: native mesh input -> USD stage (reference structure)
# ---------------------------------------------------------------------------

def _write_binary_stl(path, tris):
    tris = np.asarray(tris, dtype="<f4")  # [n, 3, 3]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, "<f4").tobytes())
            f.write(t.tobytes())
            f.write(b"\0\0")


def _cube_tris(center, size=1.0):
    c = np.asarray(center, dtype=float)
    s = size / 2
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)]) + c
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for a, b, cc, d in quads:
        tris.append([v[a], v[b], v[cc]])
        tris.append([v[a], v[cc], v[d]])
    return np.asarray(tris)


def test_stl_to_usd_conversion(tmp_path):
    stl = tmp_path / "part.stl"
    _write_binary_stl(stl, _cube_tris([0, 0, 0], 2.0))
    cfg = {"solids": {"solid_0": {
        "visuals": True, "collisions": True,
        "joint": {"body0": 0, "body1": 1, "name": "Slide"},
    }}}
    cfg_path = tmp_path / "conv.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "part.usda"
    s2u.step_to_usd(str(stl), str(out), str(cfg_path))
    st = U.Stage.Open(str(out))
    assert st.GetMetadata("defaultPrim") == "Model"
    assert st.GetMetadata("metersPerUnit") == 0.01
    assert st.GetPrimAtPath("/Model").HasAPI("PhysicsArticulationRootAPI")
    scene = st.GetPrimAtPath("/physicsScene")
    assert scene.GetAttribute("physics:gravityMagnitude").Get() == 981.0
    vis = st.GetPrimAtPath("/Model/solid_0/visual")
    assert vis.IsA("Mesh")
    pts = np.asarray(vis.GetAttribute("points").Get(), dtype=float)
    assert pts.shape == (8, 3)  # cube's 24 soup verts deduped to 8
    np.testing.assert_allclose(np.abs(pts).max(), 0.01)  # meters -> cm (/100)
    assert len(vis.GetAttribute("faceVertexIndices").Get()) == 36
    assert (vis.GetRelationship("material:binding").GetTargets()
            == ["/Model/Looks/material_191919"])
    assert st.GetPrimAtPath("/Model/Looks/material_191919/Shader").IsValid()
    col = st.GetPrimAtPath("/Model/solid_0/collision")
    assert col.HasAPI("PhysicsCollisionAPI") and col.HasAPI("PhysicsMeshCollisionAPI")
    assert col.GetAttribute("physics:approximation").Get() == "meshSimplification"
    assert col.GetAttribute("purpose").Get() == "guide"
    joint = st.GetPrimAtPath("/Model/solid_0/Slide")
    assert joint.GetTypeName() == "PhysicsPrismaticJoint"
    assert joint.GetRelationship("physics:body1").GetTargets() == ["/Model/solid_1"]


def test_obj_multi_object_and_opt_out(tmp_path):
    obj = tmp_path / "two.obj"
    obj.write_text(
        "o first\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
        "o second\nv 2 0 0\nv 3 0 0\nv 2 1 0\nv 2 0 1\nf 4 5 6 7\n")
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(
        {"solids": {"solid_1": {"convert": False}}}))
    out = tmp_path / "two.usda"
    s2u.step_to_usd(str(obj), str(out), str(cfg_path))
    st = U.Stage.Open(str(out))
    assert st.GetPrimAtPath("/Model/solid_0/visual").IsValid()
    assert not st.GetPrimAtPath("/Model/solid_1").IsValid()
    # quad face fan-triangulated into 2 tris
    obj_solids = s2u._read_obj(str(obj))
    assert len(obj_solids[1][2]) == 6


def test_ascii_stl_multi_solid(tmp_path):
    stl = tmp_path / "multi.stl"
    stl.write_text(
        "solid a\nfacet normal 0 0 1\nouter loop\n"
        "vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n"
        "endloop\nendfacet\nendsolid a\n"
        "solid b\nfacet normal 0 0 1\nouter loop\n"
        "vertex 5 0 0\nvertex 6 0 0\nvertex 5 1 0\n"
        "endloop\nendfacet\nendsolid b\n")
    solids = s2u._read_stl(str(stl))
    assert len(solids) == 2
    assert solids[0][1].shape == (3, 3)


# ---------------------------------------------------------------------------
# usd_modification: config-driven editing
# ---------------------------------------------------------------------------

def _base_stage(tmp_path):
    st = U.Stage.CreateNew(str(tmp_path / "in.usda"))
    st.SetMetadata("defaultPrim", "Model")
    model = st.DefinePrim("/Model", "Xform")
    U.Xformable(model).AddTranslateOp((0.0, 0.0, 0.0))
    body = st.DefinePrim("/Model/arm", "Xform")
    xf = U.Xformable(body)
    xf.AddTranslateOp((1.0, 2.0, 3.0))
    xf.AddOrientOp(tuple(U.quat_from_axis_angle([0, 0, 1], 90.0)))
    slider = st.DefinePrim("/Model/arm/slider", "Xform")
    U.Xformable(slider).AddTranslateOp((0.5, 0.0, 0.0))
    st.DefinePrim("/Model/arm/slider/geo", "Mesh")
    st.Save()
    return st


def test_validate_config_rejects_bad_shapes():
    ok, _ = um.validate_config({"prims": {"/a": {"mass": -1}}})
    assert not ok
    ok, _ = um.validate_config({"prims": {"/a": {"scale": [1, 2]}}})
    assert not ok
    ok, _ = um.validate_config(
        {"prims": {"/a": {"collisions": {"approximation": "bogus"}}}})
    assert not ok
    ok, _ = um.validate_config({"renames": {"noslash": "/b"}})
    assert not ok
    ok, msg = um.validate_config(
        {"rotate_x": True,
         "prims": {"/a": {"mass": 2.5, "collisions": True,
                          "scale": [1, 2, 3]}}})
    assert ok, msg


def test_modify_with_config_end_to_end(tmp_path):
    _base_stage(tmp_path)
    config = {
        "prims": {
            "/Model": {"articulation_root": True},
            "/Model/arm": {
                "rigid_body": True, "mass": 4.2, "rotate_x": True,
                "scale": [2.0, 2.0, 2.0],
                "joint": {"type": "prismatic", "name": "Lift",
                          "body1": "/Model/arm/slider",
                          "axis": [0, 0, 1],
                          "lower_limit": -0.1, "upper_limit": 0.4},
            },
            "/Model/arm/slider/geo": {
                "collisions": {"approximation": "convexHull"},
                "visuals": True,
            },
        },
    }
    out = tmp_path / "out.usda"
    ok = um.modify_usd_file_with_config(str(tmp_path / "in.usda"), str(out),
                                        config, rotation_degrees=90.0)
    assert ok
    st = U.Stage.Open(str(out))
    assert st.GetPrimAtPath("/Model").HasAPI("PhysicsArticulationRootAPI")
    arm = st.GetPrimAtPath("/Model/arm")
    assert arm.HasAPI("PhysicsRigidBodyAPI") and arm.HasAPI("PhysicsMassAPI")
    assert arm.GetAttribute("physics:mass").Get() == pytest.approx(4.2)
    # rotate_x CLEARS the op stack then appends rotateX; scale appends after
    order = arm.GetAttribute("xformOpOrder").Get()
    assert order == ["xformOp:rotateX", "xformOp:scale"]
    assert arm.GetAttribute("xformOp:rotateX").Get() == pytest.approx(90.0)
    joint = st.GetPrimAtPath("/Model/arm/Lift")
    assert joint.GetTypeName() == "PhysicsPrismaticJoint"
    assert joint.GetAttribute("physics:axis").Get() == "Z"
    assert joint.GetAttribute("physics:lowerLimit").Get() == pytest.approx(-0.1)
    assert joint.GetAttribute("physics:upperLimit").Get() == pytest.approx(0.4)
    geo = st.GetPrimAtPath("/Model/arm/slider/geo")
    assert geo.HasAPI("PhysicsCollisionAPI")
    assert geo.GetAttribute("physics:approximation").Get() == "convexHull"
    assert geo.GetAttribute("visibility").Get() == "inherited"


def test_joint_relative_frame_parent_child(tmp_path):
    """When body0 is body1's parent, the reference's chain walk drops body0
    (`get_prim_paths` pops the common ancestor) so the joint frame is just
    body1's LOCAL transform — i.e. body1 expressed in body0's frame."""
    _base_stage(tmp_path)
    config = {"prims": {"/Model/arm": {"joint": {
        "type": "prismatic", "name": "J",
        "body0": "/Model/arm", "body1": "/Model/arm/slider"}}}}
    out = tmp_path / "j.usda"
    assert um.modify_usd_file_with_config(str(tmp_path / "in.usda"),
                                          str(out), config)
    st = U.Stage.Open(str(out))
    j = st.GetPrimAtPath("/Model/arm/J")
    pos = np.asarray(j.GetAttribute("physics:localPos0").Get(), dtype=float)
    rot = np.asarray(j.GetAttribute("physics:localRot0").Get(), dtype=float)
    m_sli = U.Xformable(st.GetPrimAtPath("/Model/arm/slider")).GetLocalTransformation()
    t_exp, q_exp, _ = U.decompose_matrix(m_sli)
    np.testing.assert_allclose(pos, t_exp, atol=1e-9)
    if np.dot(rot, q_exp) < 0:
        q_exp = -q_exp
    np.testing.assert_allclose(rot, q_exp, atol=1e-8)


def test_joint_relative_frame_cross_branch(tmp_path):
    """Cross-branch chain (body0 under a sibling subtree) exercises the
    reverse-order inverse accumulation: rel = M_b1 @ inv(M_mid) @ inv(M_b0)."""
    st = _base_stage(tmp_path)
    other = st.DefinePrim("/Model/other", "Xform")
    oxf = U.Xformable(other)
    oxf.AddTranslateOp((-1.0, 0.5, 2.0))
    oxf.AddOrientOp(tuple(U.quat_from_axis_angle([1, 0, 0], 30.0)))
    st.Save()
    config = {"prims": {"/Model/arm": {"joint": {
        "type": "prismatic", "name": "J",
        "body0": "/Model/arm/slider", "body1": "/Model/other"}}}}
    out = tmp_path / "jx.usda"
    assert um.modify_usd_file_with_config(str(tmp_path / "in.usda"),
                                          str(out), config)
    st = U.Stage.Open(str(out))
    j = st.GetPrimAtPath("/Model/arm/J")
    pos = np.asarray(j.GetAttribute("physics:localPos0").Get(), dtype=float)
    rot = np.asarray(j.GetAttribute("physics:localRot0").Get(), dtype=float)
    m_sli = U.Xformable(st.GetPrimAtPath("/Model/arm/slider")).GetLocalTransformation()
    m_arm = U.Xformable(st.GetPrimAtPath("/Model/arm")).GetLocalTransformation()
    m_oth = U.Xformable(st.GetPrimAtPath("/Model/other")).GetLocalTransformation()
    rel = m_oth @ np.linalg.inv(m_arm) @ np.linalg.inv(m_sli)
    t_exp, q_exp, _ = U.decompose_matrix(rel)
    np.testing.assert_allclose(pos, t_exp, atol=1e-9)
    if np.dot(rot, q_exp) < 0:
        q_exp = -q_exp
    np.testing.assert_allclose(rot, q_exp, atol=1e-8)


def test_joint_euler_rotation_override(tmp_path):
    _base_stage(tmp_path)
    config = {"prims": {"/Model/arm": {"joint": {
        "type": "prismatic", "name": "J", "body1": "/Model/arm/slider",
        "local_position_0": [0.1, 0.2, 0.3],
        "local_rotation_0": [90.0, 0.0, 0.0]}}}}
    out = tmp_path / "e.usda"
    assert um.modify_usd_file_with_config(str(tmp_path / "in.usda"),
                                          str(out), config)
    j = U.Stage.Open(str(out)).GetPrimAtPath("/Model/arm/J")
    q = np.asarray(j.GetAttribute("physics:localRot0").Get(), dtype=float)
    expected = np.array([math.cos(math.pi / 4), math.sin(math.pi / 4), 0, 0])
    if np.dot(q, expected) < 0:
        expected = -expected
    np.testing.assert_allclose(q, expected, atol=1e-9)


def test_transform_to_translate_orient_scale(tmp_path):
    st = _base_stage(tmp_path)
    arm = st.GetPrimAtPath("/Model/arm")
    m_before = U.Xformable(arm).GetLocalTransformation()
    assert um.transform_to_translate_orient_scale(st, "/Model/arm")
    order = arm.GetAttribute("xformOpOrder").Get()
    assert order == ["xformOp:translate", "xformOp:orient", "xformOp:scale"]
    m_after = U.Xformable(arm).GetLocalTransformation()
    np.testing.assert_allclose(m_after, m_before, atol=1e-9)


def test_add_transform_and_references(tmp_path):
    st = _base_stage(tmp_path)
    assert um.add_transform(st, "/Model/arm/slider")
    s = st.GetPrimAtPath("/Model/arm/slider")
    np.testing.assert_allclose(
        U.Xformable(s).GetLocalTransformation(), np.eye(4), atol=0)
    assert um.add_reference_to_prim(st, "/Model/arm", "./sub.usd", "/Root")
    assert um.check_prim_has_references(st, "/Model/arm")
    assert um.get_references_from_prim(st, "/Model/arm") == ["./sub.usd"]
    assert um.get_all_prims_with_references(st) == ["/Model/arm"]
    # round-trips through usda
    p = tmp_path / "ref.usda"
    st.Export(str(p))
    st2 = U.Stage.Open(str(p))
    assert um.get_references_from_prim(st2, "/Model/arm") == ["./sub.usd"]


def test_modification_cli(tmp_path, capsys, monkeypatch):
    _base_stage(tmp_path)
    cfg = tmp_path / "mod.yaml"
    cfg.write_text(yaml.safe_dump(
        {"prims": {"/Model/arm": {"rigid_body": True}}}))
    monkeypatch.setattr(sys, "argv", [
        "usd_modification.py", str(tmp_path), "in.usda", "out_cli.usda",
        "mod.yaml", "45"])
    um.main()
    assert "completed successfully" in capsys.readouterr().out
    st = U.Stage.Open(str(tmp_path / "out_cli.usda"))
    assert st.GetPrimAtPath("/Model/arm").HasAPI("PhysicsRigidBodyAPI")


def test_get_prim_paths_chain():
    # mirror of the reference's path-walk semantics (`:349-383`)
    chain = um.get_prim_paths("/M/a/b", "/M/c")
    assert chain == ["/M/a/b", "/M/a", "/M/c"]
    # when body0 is an ancestor of body1, the walk drops body0 itself
    # (it IS the common ancestor, which the reference pops)
    chain = um.get_prim_paths("/M/a", "/M/a/b/c")
    assert chain == ["/M/a/b", "/M/a/b/c"]


def test_joint_chain_matches_reference_formula_two_deep(tmp_path):
    """Pin the reference's reverse-order chain walk for a body1 TWO levels
    below the common ancestor: every element before the last is INVERTED
    (including descent-side intermediates) — the reference's exact formula,
    reproduced rather than corrected (see _relative_joint_frame note)."""
    st = _base_stage(tmp_path)
    st.DefinePrim("/Model/arm/slider/tip", "Xform")
    U.Xformable(st.GetPrimAtPath("/Model/arm/slider/tip")).AddTranslateOp(
        (0.0, 0.25, 0.0))
    st.Save()
    config = {"prims": {"/Model/arm": {"joint": {
        "type": "prismatic", "name": "J",
        "body0": "/Model/arm", "body1": "/Model/arm/slider/tip"}}}}
    out = tmp_path / "deep.usda"
    assert um.modify_usd_file_with_config(str(tmp_path / "in.usda"),
                                          str(out), config)
    st = U.Stage.Open(str(out))
    j = st.GetPrimAtPath("/Model/arm/J")
    pos = np.asarray(j.GetAttribute("physics:localPos0").Get(), dtype=float)
    # chain = [slider, tip] (body0 popped as the common ancestor):
    # rel = M_tip @ inv(M_slider)  — the reference's quirk
    m_sli = U.Xformable(st.GetPrimAtPath("/Model/arm/slider")).GetLocalTransformation()
    m_tip = U.Xformable(st.GetPrimAtPath("/Model/arm/slider/tip")).GetLocalTransformation()
    t_exp, _, _ = U.decompose_matrix(m_tip @ np.linalg.inv(m_sli))
    np.testing.assert_allclose(pos, t_exp, atol=1e-9)


def test_material_connections_roundtrip(tmp_path):
    """Material outputs use the official `.connect` statement syntax and
    survive write -> parse -> write."""
    stl = tmp_path / "m.stl"
    _write_binary_stl(stl, _cube_tris([0, 0, 0], 1.0))
    out = tmp_path / "m.usda"
    s2u.step_to_usd(str(stl), str(out))
    text = open(out).read()
    assert ("token outputs:mdl:surface.connect = "
            "</Model/Looks/material_191919/Shader.outputs:out>") in text
    st = U.Stage.Open(str(out))
    mat = st.GetPrimAtPath("/Model/Looks/material_191919")
    a = mat.GetAttribute("outputs:mdl:surface")
    assert a.connect == "/Model/Looks/material_191919/Shader.outputs:out"
    # stable second round-trip
    assert U.parse_usda(st.ExportToString()).ExportToString() == st.ExportToString()


def test_attribute_metadata_roundtrip():
    """Attribute paren-metadata survives parse (not silently dropped)."""
    text = '''#usda 1.0

def Mesh "m"
{
    float weight = 0.5 (documentation = "blend"; hidden = true)
}
'''
    st = U.parse_usda(text)
    a = st.GetPrimAtPath("/m").GetAttribute("weight")
    assert a.meta == {"documentation": "blend", "hidden": True}
    out = st.ExportToString()
    a2 = U.parse_usda(out).GetPrimAtPath("/m").GetAttribute("weight")
    assert a2.meta == a.meta


def test_shipped_asset_configs(tmp_path):
    """The example configs under assets/robots/ (reference-parity schemas,
    see assets/robots/README.md) drive both CLIs end-to-end: 4-solid OBJ ->
    USD with the v2 joint chain, then v3 config-driven structuring."""
    assets = os.path.join(os.path.dirname(__file__), "..", "..",
                          "assets", "robots")
    conv_cfg = os.path.join(assets, "v2", "configs", "conversion_config.yaml")
    struct_cfg = os.path.join(assets, "v3", "configs", "structure_config.yaml")

    # 4 connected shells -> solid_0..solid_3
    lines = []
    vbase = 0
    for i in range(4):
        lines.append(f"o part{i}")
        for tri in _cube_tris([3.0 * i, 0, 0], 1.0):
            for p in tri:
                lines.append(f"v {p[0]} {p[1]} {p[2]}")
        for t in range(12):
            a = vbase + 3 * t
            lines.append(f"f {a + 1} {a + 2} {a + 3}")
        vbase += 36
    obj = tmp_path / "arm.obj"
    obj.write_text("\n".join(lines) + "\n")

    out = tmp_path / "arm.usda"
    s2u.step_to_usd(str(obj), str(out), str(conv_cfg))
    st = U.Stage.Open(str(out))
    for i in range(4):
        assert st.GetPrimAtPath(f"/Model/solid_{i}/visual").IsA("Mesh")
    j = st.GetPrimAtPath("/Model/solid_0/main_arm_joint1")
    assert j.GetTypeName() == "PhysicsPrismaticJoint"
    assert j.GetRelationship("physics:body0").GetTargets() == ["/Model/solid_1"]
    # chain: joint{k} hangs solid_{k-1} off solid_k
    assert st.GetPrimAtPath("/Model/solid_2/main_arm_joint3").IsValid()

    with open(struct_cfg) as f:
        cfg = yaml.safe_load(f)
    out2 = tmp_path / "arm_structured.usda"
    ok = um.modify_usd_file_with_config(str(out), str(out2), cfg,
                                        rotation_degrees=-90.0)
    assert ok
    st2 = U.Stage.Open(str(out2))
    model = st2.GetPrimAtPath("/Model")
    assert model.GetAttribute("xformOp:rotateX").Get() == pytest.approx(-90.0)
    for i in range(4):
        vis = st2.GetPrimAtPath(f"/Model/solid_{i}/visual")
        assert vis.HasAPI("PhysicsCollisionAPI")
        assert vis.GetAttribute("physics:approximation").Get() == "convexHull"
