"""Cluster submission manifests (reference `app/main_distributed.py` role)
tested as pure text rendering + a rendezvous round-trip: the env the
rendered GKE manifest injects must be exactly what `resolve_cluster`
parses on the worker."""

import os

import yaml

from vjepa2_tpu.cli.submit import (
    cluster_section, job_name, main, render_jobset, render_sbatch,
)
from vjepa2_tpu.core.distributed import resolve_cluster

CFG = {
    "app": "vjepa",
    "nodes": 16,  # reference-style top-level header
    "folder": "/tmp/unused",
    "cluster": {"account": "acct", "partition": "tpu", "mem": "200G"},
}


def test_cluster_section_merges_reference_header():
    c = cluster_section(CFG)
    assert c["nodes"] == 16  # top-level `nodes:` honored like the reference
    assert c["account"] == "acct"
    assert c["backend"] == "slurm"


def test_render_sbatch():
    text = render_sbatch(CFG, "configs/train/vitl16/pretrain-256px-16f.yaml", "/runs/x")
    assert "#SBATCH --nodes=16" in text
    assert "#SBATCH --requeue" in text
    # SIGTERM warning window feeds PreemptionGuard -> checkpoint -> requeue
    assert "--signal=TERM@120" in text
    assert "#SBATCH --account=acct" in text
    assert "srun python -m vjepa2_tpu.cli.launch --fname /runs/x/config.yaml" in text


def test_render_jobset_rendezvous_roundtrip():
    text = render_jobset(CFG, "pretrain-256px-16f.yaml", "/runs/x")
    m = yaml.safe_load(text)
    assert m["kind"] == "JobSet"
    job = m["spec"]["replicatedJobs"][0]["template"]["spec"]
    assert job["parallelism"] == 16
    env = {e["name"]: e["value"]
           for e in job["template"]["spec"]["containers"][0]["env"]}
    # what the JobSet controller adds per pod:
    env["JOB_COMPLETION_INDEX"] = "5"
    coord, num, pid = resolve_cluster(env)
    assert num == 16 and pid == 5
    assert coord == env["COORDINATOR_ADDRESS"] + ":37129"  # reference port


def test_main_dry_run_stamps_run_dir(tmp_path):
    cfg = dict(CFG, folder=str(tmp_path / "runs"))
    fname = tmp_path / "cfg.yaml"
    fname.write_text(yaml.safe_dump(cfg))
    rc = main(["--fname", str(fname), "--dry-run"])
    assert rc == 0
    (run_dir,) = (tmp_path / "runs").iterdir()
    names = {p.name for p in run_dir.iterdir()}
    assert "job.sbatch" in names and "config.yaml" in names
    assert "params-vjepa.yaml" in names and "git-info.txt" in names
    stamped = yaml.safe_load((run_dir / "config.yaml").read_text())
    assert stamped["folder"] == str(run_dir)  # job outputs land by the manifest


def test_main_gke_backend(tmp_path):
    cfg = dict(CFG, folder=str(tmp_path / "runs"))
    fname = tmp_path / "cfg.yaml"
    fname.write_text(yaml.safe_dump(cfg))
    rc = main(["--fname", str(fname), "--backend", "gke", "--dry-run"])
    assert rc == 0
    (run_dir,) = (tmp_path / "runs").iterdir()
    assert (run_dir / "jobset.yaml").exists()


def test_job_name_sanitized():
    assert "_" not in job_name(CFG, "some_config_name.yaml")
