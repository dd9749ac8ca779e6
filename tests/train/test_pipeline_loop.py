"""YAML -> Pretrainer plumbing for pipeline parallelism (mesh.pipe).

The reference has no pipeline engine — it scales by DDP only
(`src/utils/distributed.py`); here `mesh: {pipe: P}` splits the encoder's
block stack into GPipe stages (core/pipeline.py) and the full training loop
(state init, per-fpc compiled step, checkpointing layout) runs on the
8-virtual-device CPU mesh with data=2 x pipe=4.
"""

import os
import unittest

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TestPipelineLoop(unittest.TestCase):
    def test_smoke_pipeline_config_end_to_end(self):
        from vjepa2_tpu.core.config import load_config
        from vjepa2_tpu.train.loop import Pretrainer

        cfg = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        assert cfg.mesh.pipe == 4 and cfg.mesh.pipe_microbatches == 2
        cfg.folder = "/tmp/vjepa2_tpu_smoke_pipeline_test"
        trainer = Pretrainer(cfg, synthetic_data=True)
        self.assertTrue(trainer.pipeline)
        self.assertEqual(trainer.mesh.shape["pipe"], 4)
        result = trainer.run(epochs=1, log_every=2)
        self.assertTrue(np.isfinite(result["loss"]))

    def test_online_eval_sees_plain_layout_under_pipeline(self):
        """The online-eval hook must receive the unstacked blocks_i tree,
        not the pipeline's stacked 'encoder_blocks' layout (review fix)."""
        from vjepa2_tpu.core.config import load_config
        from vjepa2_tpu.train.loop import Pretrainer

        cfg = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        cfg.folder = "/tmp/vjepa2_tpu_smoke_pipeline_eval_test"
        cfg.meta.eval_freq = 1
        trainer = Pretrainer(cfg, synthetic_data=True)
        seen = {}

        def spy(encoder, target_params, epoch, **kw):
            seen["params"] = target_params
            return {"spy": 0.0}

        trainer.online_eval = spy
        result = trainer.run(epochs=1, log_every=2)
        self.assertTrue(np.isfinite(result["loss"]))
        self.assertIn("patch_embed", seen["params"])
        self.assertIn("blocks_0", seen["params"])
        self.assertNotIn("encoder_blocks", seen["params"])

    def test_eval_cli_extracts_encoder_from_any_layout(self):
        """`cli.eval._extract_encoder_params` accepts hub params, TrainState
        dicts, and the pipeline layout (review fix)."""
        import jax.numpy as jnp

        from vjepa2_tpu.cli.eval import _extract_encoder_params
        from vjepa2_tpu.core.pipeline import split_block_params

        enc_tree = {
            "patch_embed": {"proj": {"kernel": jnp.ones((4, 8))}},
            "norm": {"scale": jnp.ones((8,))},
            "blocks_0": {"w": jnp.ones((8, 8))},
            "blocks_1": {"w": jnp.full((8, 8), 2.0)},
        }
        # (a) bare encoder params pass through
        self.assertIs(_extract_encoder_params(enc_tree), enc_tree)
        # (b) whole-TrainState dict -> EMA target
        st = {"params": {"encoder": enc_tree, "predictor": {}},
              "target_params": enc_tree, "step": 3}
        self.assertIs(_extract_encoder_params(st), enc_tree)
        # (c) pipeline layout -> unstacked
        rest, stacked = split_block_params(enc_tree)
        out = _extract_encoder_params(
            {"encoder": rest, "encoder_blocks": stacked})
        self.assertIn("patch_embed", out)
        np.testing.assert_array_equal(
            np.asarray(out["blocks_1"]["w"]),
            np.asarray(enc_tree["blocks_1"]["w"]))
        # (c') TrainState of a pipeline run
        st_pp = {"params": {"encoder": rest, "encoder_blocks": stacked,
                            "predictor": {}},
                 "target_params": {"encoder": rest, "encoder_blocks": stacked},
                 "step": 3}
        self.assertIn("blocks_0", _extract_encoder_params(st_pp))

    def test_pipeline_with_grad_accum_end_to_end(self):
        """PP x grad_accum from YAML: the loop reshapes [A*B] batches into
        accumulation microbatches and each runs the full GPipe pass."""
        from vjepa2_tpu.core.config import load_config
        from vjepa2_tpu.train.loop import Pretrainer

        cfg = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        cfg.folder = "/tmp/vjepa2_tpu_smoke_pipeline_accum_test"
        cfg.optimization.grad_accum = 2
        cfg.optimization.ipe = 2
        trainer = Pretrainer(cfg, synthetic_data=True)
        self.assertTrue(trainer.pipeline)
        self.assertEqual(trainer.grad_accum, 2)
        result = trainer.run(epochs=1, log_every=1)
        self.assertTrue(np.isfinite(result["loss"]))

    def test_pipeline_checkpoint_resume_and_layout_mismatch(self):
        """A PP run's orbax checkpoint (stacked 'encoder_blocks' layout)
        resumes under the same layout — and flipping mesh.pipe on the run
        folder raises the readable layout error, not a bare orbax tree
        mismatch."""
        import shutil

        from vjepa2_tpu.core.config import load_config
        from vjepa2_tpu.train.loop import Pretrainer

        folder = "/tmp/vjepa2_tpu_smoke_pipeline_resume_test"
        shutil.rmtree(folder, ignore_errors=True)
        cfg = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        cfg.folder = folder
        cfg.meta.load_checkpoint = True
        cfg.optimization.ipe = 2
        trainer = Pretrainer(cfg, synthetic_data=True)
        result = trainer.run(epochs=1, log_every=1)
        self.assertTrue(np.isfinite(result["loss"]))

        # same layout -> resumes at the saved step
        cfg2 = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        cfg2.folder = folder
        cfg2.meta.load_checkpoint = True
        cfg2.optimization.ipe = 2
        trainer2 = Pretrainer(cfg2, synthetic_data=True)
        state = trainer2.restore_or_init()
        self.assertEqual(int(state.step), 2)

        # flipped to the plain layout -> readable error naming mesh.pipe
        cfg3 = load_config(
            os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml"))
        cfg3.folder = folder
        cfg3.meta.load_checkpoint = True
        cfg3.mesh.pipe = 1
        cfg3.mesh.pipe_microbatches = 1
        cfg3.mesh.data = -1
        trainer3 = Pretrainer(cfg3, synthetic_data=True)
        with self.assertRaisesRegex(RuntimeError, "mesh.pipe"):
            trainer3.restore_or_init()

    def test_pipeline_rejects_bad_compositions(self):
        from vjepa2_tpu.core.config import load_config
        from vjepa2_tpu.train.loop import Pretrainer

        base = os.path.join(REPO, "configs", "train", "smoke-pipeline.yaml")

        cfg = load_config(base)
        cfg.model.context_parallel = True
        with self.assertRaises(AssertionError):
            Pretrainer(cfg, synthetic_data=True)

        cfg = load_config(base)
        cfg.data.batch_size = 9  # not divisible by pipe_microbatches=2
        with self.assertRaises(AssertionError):
            Pretrainer(cfg, synthetic_data=True)


if __name__ == "__main__":
    unittest.main()


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
