"""USD stage editing for robot-sim assets, driven by a YAML config.

Parity counterpart of reference `src/utils/usd_modification.py:1-815`
(same YAML schema, same operation set, same CLI), re-implemented on the
dependency-free `tools/usdlite.py` scene graph instead of `pxr`, so it runs
in this image. Stages are read/written in the official `.usda` text format
and load unchanged in pxr-based runtimes (usdview / Isaac Sim).

Operations (one per config key, applied in the reference's order):
  rigid_body, articulation_root, rotate_x, scale, visuals, collisions
  (with approximation), translate_op, mass, joint (prismatic, with
  body-chain-derived local pos/rot), transform_to_translate_orient_scale,
  add_transform. Reference helpers (get_references_from_prim,
  check_prim_has_references, add_reference_to_prim,
  get_all_prims_with_references) are provided with the same signatures.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import usdlite as U  # noqa: E402
from usdlite import Stage, Xformable  # noqa: E402

VALID_APPROXIMATIONS = ["convexHull", "meshSimplification", "triangleMesh",
                        "sphere", "capsule", "box"]


# ---------------------------------------------------------------------------
# Config validation / loading (reference usd_modification.py:6-128)
# ---------------------------------------------------------------------------

def validate_config(config):
    """Validate the YAML configuration structure (reference `:6-75`)."""
    if not isinstance(config, dict):
        return False, "Configuration must be a dictionary"
    if "rotate_x" in config and not isinstance(config["rotate_x"], bool):
        return False, "'rotate_x' must be a boolean"
    # NOTE: 'renames' is validated but (like the reference,
    # `src/utils/usd_modification.py:15-30`, which also has no apply step)
    # never applied — kept for config-surface parity only.
    if "renames" in config:
        if not isinstance(config["renames"], dict):
            return False, "'renames' must be a dictionary"
        for old, new in config["renames"].items():
            if not isinstance(old, str) or not isinstance(new, str):
                return False, ("Rename mapping keys and values must be "
                               f"strings: '{old}' -> '{new}'")
            if not old.startswith("/") or not new.startswith("/"):
                return False, f"Rename paths must start with '/': '{old}' -> '{new}'"
    if "prims" in config:
        if not isinstance(config["prims"], dict):
            return False, "'prims' must be a dictionary"
        for prim_path, pc in config["prims"].items():
            if not isinstance(pc, dict):
                return False, f"Configuration for prim '{prim_path}' must be a dictionary"
            for flag in ["visuals", "rigid_body", "articulation_root",
                         "translate_op"]:
                if flag in pc and not isinstance(pc[flag], bool):
                    return False, f"'{flag}' flag for prim '{prim_path}' must be a boolean"
            if "collisions" in pc:
                col = pc["collisions"]
                if not isinstance(col, (bool, dict)):
                    return False, (f"'collisions' for prim '{prim_path}' must "
                                   "be a boolean or dictionary")
                if isinstance(col, dict) and "approximation" in col:
                    if col["approximation"] not in VALID_APPROXIMATIONS:
                        return False, (f"'approximation' for collisions in prim "
                                       f"'{prim_path}' must be one of "
                                       f"{VALID_APPROXIMATIONS}")
            if "mass" in pc:
                m = pc["mass"]
                if not isinstance(m, (int, float)) or m <= 0:
                    return False, f"'mass' for prim '{prim_path}' must be a positive number"
            if "scale" in pc:
                s = pc["scale"]
                if (not isinstance(s, (list, tuple)) or len(s) != 3
                        or not all(isinstance(x, (int, float)) for x in s)):
                    return False, f"'scale' for prim '{prim_path}' must be a list of 3 numbers"
            if "joint" in pc and not isinstance(pc["joint"], dict):
                return False, f"'joint' for prim '{prim_path}' must be a dictionary"
    return True, "Configuration is valid"


def load_config(config_path):
    """Load + validate a YAML config; None on failure (reference `:77-114`)."""
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
        print(f"Loaded configuration from {config_path}")
        return config
    except yaml.YAMLError as e:
        print(f"Error parsing YAML config: {e}")
        return None


def get_prim_config(prim_path, config):
    if not config or "prims" not in config:
        return {}
    return config["prims"].get(prim_path, {})


def should_rotate_x(config):
    """Reference-parity quirk, kept: the TOP-LEVEL `rotate_x` key is
    validated and echoed by main() but — exactly as in the reference
    (`usd_modification.py:202-262` reads only the per-prim key) — never
    applied; rotation happens through each prim's own `rotate_x` entry."""
    if not config:
        return False
    return config.get("rotate_x", False)


# ---------------------------------------------------------------------------
# Transform ops (reference `:131-200`)
# ---------------------------------------------------------------------------

def _xformable(stage, prim_path):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return None
    xf = Xformable(prim)
    if not xf:
        print(f"Error: Prim at {prim_path} is not transformable")
        return None
    return xf


def rotate_object_x_axis(stage, object_path, rotation_degrees):
    """Clear the op stack and rotate about X (reference `:131-167`)."""
    xf = _xformable(stage, object_path)
    if xf is None:
        return False
    xf.ClearXformOpOrder()
    xf.AddRotateXOp(rotation_degrees)
    print(f"Applied {rotation_degrees} degree rotation around x-axis to {object_path}")
    return True


def apply_scale_transform(stage, object_path, scale_values):
    """Append a scale op (reference `:169-200`)."""
    xf = _xformable(stage, object_path)
    if xf is None:
        return False
    xf.AddScaleOp(tuple(float(s) for s in scale_values))
    print(f"Applied scale {scale_values} to {object_path}")
    return True


# ---------------------------------------------------------------------------
# Physics / geometry APIs (reference `:264-347`, `:498-559`)
# ---------------------------------------------------------------------------

def create_rigid_body(stage, prim_path):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return False
    prim.ApplyAPI("PhysicsRigidBodyAPI")
    print(f"Applied RigidBodyAPI to {prim_path}")
    return True


def create_articulation_root(stage, prim_path):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return False
    prim.ApplyAPI("PhysicsArticulationRootAPI")
    prim.CreateAttribute("physxArticulation:solverPositionIterationCount",
                         "int", 16, custom=True)
    print(f"Applied ArticulationRootAPI to {prim_path}")
    return True


def create_visuals(stage, prim_path):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return False
    prim.CreateAttribute("visibility", "token", "inherited")
    prim.CreateAttribute("purpose", "token", "default", uniform=True)
    print(f"Enabled visuals for {prim_path}")
    return True


def create_collisions(stage, prim_path, approximation="convexHull"):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return False
    prim.ApplyAPI("PhysicsCollisionAPI")
    prim.CreateAttribute("physics:collisionEnabled", "bool", True)
    print(f"Applied CollisionAPI to {prim_path}")
    if prim.IsA("Mesh"):
        prim.ApplyAPI("PhysicsMeshCollisionAPI")
        prim.CreateAttribute("physics:approximation", "token", approximation,
                             uniform=True)
        print(f"Applied MeshCollisionAPI to {prim_path} with {approximation} approximation")
    return True


def create_translate_op(stage, prim_path):
    xf = _xformable(stage, prim_path)
    if xf is None:
        return False
    if xf.GetTranslateOp() is None:
        xf.AddTranslateOp((0.0, 0.0, 0.0))
    print(f"Applied translation operation to {prim_path}")
    return True


def create_mass(stage, prim_path, mass_value):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return False
    prim.ApplyAPI("PhysicsMassAPI")
    prim.CreateAttribute("physics:mass", "float", float(mass_value))
    print(f"Applied mass {mass_value} kg to {prim_path}")
    return True


# ---------------------------------------------------------------------------
# Joints (reference `:349-496`)
# ---------------------------------------------------------------------------

def get_prim_paths(body0_path, body1_path):
    """Prim-path chain from body0 up to the common ancestor and down to
    body1, excluding the ancestor (reference `:349-383`)."""
    b0 = [p for p in body0_path.split("/") if p]
    b1 = [p for p in body1_path.split("/") if p]
    common = 0
    for i in range(min(len(b0), len(b1))):
        if b0[i] == b1[i]:
            common = i + 1
        else:
            break
    chain = [body0_path]
    for i in range(len(b0), common, -1):
        parts = b0[:i - 1]
        if parts:
            chain.append("/" + "/".join(parts))
    chain.pop(-1)  # drop the common ancestor
    for i in range(common + 1, len(b1) + 1):
        chain.append("/" + "/".join(b1[:i]))
    return chain


def _relative_joint_frame(stage, body0_path, body1_path):
    """Accumulated relative transform along the body chain (the reference's
    reverse-order matrix product, `:449-476`); returns (pos[3], quat[4]).

    NOTE (reference-parity quirk, kept deliberately): the reference inverts
    EVERY chain element before the last — including intermediate prims on
    the DESCENT side toward body1 (`relative_transform *
    body_prev_matrix.GetInverse()` for all i < last). For chains where
    body1 sits 2+ levels below the common ancestor this subtracts rather
    than adds the intermediate offsets; we reproduce the reference's output
    bit-for-bit rather than "fix" its kinematics (pinned by
    `test_joint_chain_matches_reference_formula_two_deep`). Configs can
    always override via local_position_0/local_rotation_0."""
    chain = get_prim_paths(str(body0_path), str(body1_path))
    prims = [stage.GetPrimAtPath(p) for p in chain]
    if not all(p.IsValid() for p in prims):
        print(f"Warning: Could not find body0 ({body0_path}) or body1 ({body1_path}) prims")
        return None
    mats = [Xformable(p).GetLocalTransformation() for p in prims]
    rel = mats[-1]
    for i in range(len(mats) - 2, -1, -1):
        rel = rel @ np.linalg.inv(mats[i])
    t, q, _ = U.decompose_matrix(rel)
    return t, q


def create_joint(stage, prim_path, joint_config):
    """Create a physics joint under `prim_path` (reference `:385-496`).
    Only the prismatic type exists in the reference; kept that way."""
    if not joint_config or "type" not in joint_config:
        print(f"Error: Invalid joint configuration for {prim_path}")
        return False
    joint_type = joint_config["type"]
    joint_name = joint_config.get("name", "Joint")
    if joint_type != "prismatic":
        print(f"Error: Unsupported joint type '{joint_type}' for {prim_path}")
        return False
    if "body1" not in joint_config:
        print(f"Error: Prismatic joint for {prim_path} missing body0 or body1")
        return False

    joint = stage.DefinePrim(f"{prim_path}/{joint_name}", "PhysicsPrismaticJoint")
    body0_path = joint_config.get("body0", prim_path)
    body1_path = joint_config["body1"]
    joint.CreateRelationship("physics:body0").SetTargets([body0_path])
    joint.CreateRelationship("physics:body1").SetTargets([body1_path])

    if "axis" in joint_config:
        ax = joint_config["axis"]
        if isinstance(ax, (list, tuple)):
            joint.CreateAttribute("physics:axis", "token",
                                  "XYZ"[int(np.argmax(np.abs(ax)))], uniform=True)
        else:
            joint.CreateAttribute("physics:axis", "token", str(ax), uniform=True)

    if "local_position_0" in joint_config and "local_rotation_0" in joint_config:
        pos = tuple(float(x) for x in joint_config["local_position_0"])
        joint.CreateAttribute("physics:localPos0", "point3f", pos)
        print(f"Overriding calculated position with config value: {pos}")
        rot = joint_config["local_rotation_0"]
        if isinstance(rot, (list, tuple)):
            if len(rot) == 3:  # Euler XYZ degrees -> quat
                quat = U.quat_from_euler_xyz(rot)
            else:  # already (w, x, y, z)
                quat = np.asarray(rot, dtype=float)
        else:
            quat = U.quat_identity()
        joint.CreateAttribute("physics:localRot0", "quatf", tuple(quat))
        print(f"Overriding calculated rotation with config value: {tuple(quat)}")
    else:
        frame = _relative_joint_frame(stage, body0_path, body1_path)
        if frame is not None:
            t, q = frame
            joint.CreateAttribute("physics:localPos0", "point3f", tuple(t))
            joint.CreateAttribute("physics:localRot0", "quatf", tuple(q))
            print(f"Final joint transform (reverse order) - Position: {tuple(t)}, "
                  f"Rotation: {tuple(q)}")

    if "lower_limit" in joint_config:
        joint.CreateAttribute("physics:lowerLimit", "float",
                              float(joint_config["lower_limit"]))
    if "upper_limit" in joint_config:
        joint.CreateAttribute("physics:upperLimit", "float",
                              float(joint_config["upper_limit"]))
    print(f"Created prismatic joint {joint_name} at {prim_path}")
    return True


# ---------------------------------------------------------------------------
# References (reference `:561-666`)
# ---------------------------------------------------------------------------

def get_references_from_prim(stage, prim_path):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return []
    return [r.asset_path for r in prim.GetReferences() if r.asset_path]


def check_prim_has_references(stage, prim_path):
    prim = stage.GetPrimAtPath(prim_path)
    return bool(prim.IsValid() and prim.HasReferences())


def add_reference_to_prim(stage, prim_path, reference_asset_path,
                          prim_path_in_reference=None):
    prim = stage.GetPrimAtPath(prim_path)
    if not prim.IsValid():
        print(f"Error: No prim found at path {prim_path}")
        return False
    prim.AddReference(reference_asset_path, prim_path_in_reference or "")
    print(f"Added reference '{reference_asset_path}' to prim '{prim_path}'")
    return True


def get_all_prims_with_references(stage):
    return [p.GetPath() for p in stage.Traverse() if p.HasReferences()]


# ---------------------------------------------------------------------------
# Transform decomposition (reference `:668-778`)
# ---------------------------------------------------------------------------

def transform_to_translate_orient_scale(stage, prim_path):
    """Decompose the prim's composed local transform into explicit
    translate/orient/scale ops (reference `:668-729`)."""
    xf = _xformable(stage, prim_path)
    if xf is None:
        return False
    matrix = xf.GetLocalTransformation()
    translate, quat, scale = U.decompose_matrix(matrix)
    xf.ClearXformOpOrder()
    xf.AddTranslateOp(tuple(translate))
    xf.AddOrientOp(tuple(quat))
    xf.AddScaleOp(tuple(scale), precision="double")
    print(f"Successfully decomposed transform matrix to TRS operations for "
          f"{prim_path} with scale {tuple(scale)}")
    return True


def add_transform(stage, prim_path):
    """Install an identity TRS op stack (reference `:731-778`)."""
    xf = _xformable(stage, prim_path)
    if xf is None:
        return False
    xf.ClearXformOpOrder()
    xf.AddTranslateOp((0.0, 0.0, 0.0))
    xf.AddOrientOp((1.0, 0.0, 0.0, 0.0))
    xf.AddScaleOp((1.0, 1.0, 1.0), precision="double")
    print(f"Successfully added TRS transform operations to {prim_path}")
    return True


# ---------------------------------------------------------------------------
# Driver (reference `:202-262`, `:780-815`)
# ---------------------------------------------------------------------------

def modify_usd_file_with_config(input_path, output_path, config,
                                rotation_degrees=90.0):
    if not os.path.exists(input_path):
        print(f"Error: Input file {input_path} does not exist")
        return False
    try:
        stage = Stage.Open(input_path)
    except Exception as e:
        print(f"Error: Could not open USD file {input_path}: {e}")
        return False
    print(f"Successfully opened {input_path}")
    for prim_path, pc in (config or {}).get("prims", {}).items():
        if pc.get("rigid_body"):
            create_rigid_body(stage, prim_path)
        if pc.get("articulation_root"):
            create_articulation_root(stage, prim_path)
        if pc.get("rotate_x"):
            rotate_object_x_axis(stage, prim_path, rotation_degrees)
        if "scale" in pc:
            apply_scale_transform(stage, prim_path, pc["scale"])
        if pc.get("visuals"):
            create_visuals(stage, prim_path)
        if pc.get("collisions"):
            col = pc["collisions"]
            approx = (col.get("approximation", "convexHull")
                      if isinstance(col, dict) else "convexHull")
            create_collisions(stage, prim_path, approx)
        if pc.get("translate_op"):
            create_translate_op(stage, prim_path)
        if "mass" in pc:
            create_mass(stage, prim_path, pc["mass"])
        if pc.get("joint"):
            create_joint(stage, prim_path, pc["joint"])
        if pc.get("transform_to_translate_orient_scale"):
            transform_to_translate_orient_scale(stage, prim_path)
        if pc.get("add_transform"):
            add_transform(stage, prim_path)
    d = os.path.dirname(output_path)
    if d:
        os.makedirs(d, exist_ok=True)
    stage.Export(output_path)
    print(f"Successfully saved modified USD to {output_path}")
    return True


def main():
    if len(sys.argv) < 4:
        print("Usage: python usd_modification.py base_dir input.usd output.usd "
              "[config.yaml] [rotation_degrees]")
        sys.exit(1)
    base_dir = sys.argv[1]
    input_file = os.path.join(base_dir, sys.argv[2])
    output_file = os.path.join(base_dir, sys.argv[3])
    config = load_config(os.path.join(base_dir, sys.argv[4])) if len(sys.argv) > 4 else None
    rotation_degrees = float(sys.argv[5]) if len(sys.argv) > 5 else 90.0
    print(f"Input file: {input_file}")
    print(f"Output file: {output_file}")
    if config:
        print(f"Rotate X enabled: {should_rotate_x(config)}")
        if config.get("prims"):
            print(f"Configured prims: {list(config['prims'].keys())}")
    print(f"Rotation: {rotation_degrees} degrees around x-axis")
    ok = modify_usd_file_with_config(input_file, output_file, config,
                                     rotation_degrees)
    print("USD modification completed successfully!" if ok
          else "USD modification failed!")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
