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
