"""Scheduler-env rendezvous resolution (reference `src/utils/distributed.py`
reads SLURM_NTASKS/SLURM_PROCID + MASTER_ADDR; we additionally resolve GKE
JobSet pods), tested as a pure function of the env — multi-node behavior
without a cluster, like the reference's rank-parameterized sampler tests."""

from vjepa2_tpu.core.distributed import first_slurm_host, resolve_cluster


def test_first_slurm_host():
    assert first_slurm_host("node001") == "node001"
    assert first_slurm_host("node[001-004]") == "node001"
    assert first_slurm_host("node[3,7-9]") == "node3"
    assert first_slurm_host("a[1-2],b[5]") == "a1"
    assert first_slurm_host("tpu-host-7,tpu-host-9") == "tpu-host-7"


def test_explicit_jax_env_wins():
    env = {
        "JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234",
        "JAX_NUM_PROCESSES": "4",
        "JAX_PROCESS_ID": "2",
        "SLURM_PROCID": "9",  # must be ignored
        "SLURM_NTASKS": "99",
    }
    assert resolve_cluster(env) == ("10.0.0.1:1234", 4, 2)


def test_slurm_env():
    env = {
        "SLURM_PROCID": "3",
        "SLURM_NTASKS": "8",
        "SLURM_JOB_NODELIST": "gpu[017-024]",
    }
    coord, num, pid = resolve_cluster(env)
    assert coord == "gpu017:37129"  # reference's fixed port
    assert (num, pid) == (8, 3)


def test_slurm_master_addr_overrides_nodelist():
    env = {
        "SLURM_PROCID": "0",
        "SLURM_NTASKS": "2",
        "SLURM_JOB_NODELIST": "n[1-2]",
        "MASTER_ADDR": "head.cluster",
        "MASTER_PORT": "4444",
    }
    assert resolve_cluster(env)[0] == "head.cluster:4444"


def test_gke_jobset_env():
    env = {
        "JOB_COMPLETION_INDEX": "5",
        "NUM_PROCESSES": "16",
        "COORDINATOR_ADDRESS": "job-0.headless.svc",
    }
    coord, num, pid = resolve_cluster(env)
    assert coord == "job-0.headless.svc:37129"
    assert (num, pid) == (16, 5)


def test_single_host_no_env():
    assert resolve_cluster({}) == (None, None, None)
