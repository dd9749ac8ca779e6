"""Checkpoint layout conversion (tools/convert_pp_layout.py): a plain run's
orbax checkpoint converts to the pipeline layout and RESUMES under
mesh.pipe > 1 at the saved step — and the round trip back is leaf-exact
(params, EMA target, and the Adam moments inside the optax state)."""

import os
import shutil
import sys
import unittest

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tools"))

A = "/tmp/vjepa2_tpu_convert_pp_plain_run"
B = "/tmp/vjepa2_tpu_convert_pp_pp_run"
C = "/tmp/vjepa2_tpu_convert_pp_back_run"


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k], f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaves(v, f"{prefix}[{i}]")
    elif tree is not None:
        yield prefix, np.asarray(tree)


class TestConvertPPLayout(unittest.TestCase):
    def test_plain_to_pp_resume_and_roundtrip(self):
        import orbax.checkpoint as ocp

        from convert_pp_layout import convert_run_folder
        from vjepa2_tpu.core.config import load_config
        from vjepa2_tpu.train.loop import Pretrainer

        for d in (A, B, C):
            shutil.rmtree(d, ignore_errors=True)

        # ---- a 2-step PLAIN run (mesh.pipe = 1)
        cfg = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        cfg.folder = A
        cfg.mesh.pipe = 1
        cfg.mesh.pipe_microbatches = 1
        cfg.mesh.data = -1
        cfg.meta.load_checkpoint = True
        cfg.optimization.ipe = 2
        trainer = Pretrainer(cfg, synthetic_data=True)
        self.assertFalse(trainer.pipeline)
        trainer.run(epochs=1, log_every=1)

        # ---- convert plain -> pp, resume under mesh.pipe = 4
        step = convert_run_folder(A, B, "pp")
        self.assertEqual(step, 2)
        cfg_pp = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        cfg_pp.folder = B
        cfg_pp.meta.load_checkpoint = True
        cfg_pp.optimization.ipe = 2
        trainer_pp = Pretrainer(cfg_pp, synthetic_data=True)
        self.assertTrue(trainer_pp.pipeline)
        state = trainer_pp.restore_or_init()
        self.assertEqual(int(state.step), 2)
        self.assertIn("encoder_blocks", state.params)

        # ---- round trip pp -> plain is leaf-exact vs the original run
        convert_run_folder(B, C, "plain")
        raw_a = ocp.CheckpointManager(os.path.join(A, "ckpt")).restore(
            2, args=ocp.args.StandardRestore())
        raw_c = ocp.CheckpointManager(os.path.join(C, "ckpt")).restore(
            2, args=ocp.args.StandardRestore())
        la, lc = list(_leaves(raw_a)), list(_leaves(raw_c))
        self.assertEqual([p for p, _ in la], [p for p, _ in lc])
        self.assertGreater(len(la), 20)
        for (pa, va), (_, vc) in zip(la, lc):
            np.testing.assert_array_equal(va, vc, err_msg=pa)


if __name__ == "__main__":
    unittest.main()


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
