"""Device mesh + sharding rules (replaces the reference's NCCL/DDP layer).

The reference's only parallelism is DDP over NCCL
(`src/utils/distributed.py`, SURVEY.md §2.6). TPU-native equivalent: one
`jax.sharding.Mesh` with axes

* ``data``  — pure data parallel (ICI, and DCN across slices),
* ``fsdp``  — data parallel that additionally shards params/opt-state
              (ZeRO-3 style; gives the memory headroom DDP lacked),
* ``model`` — tensor parallel for attention heads / MLP hidden dim.

Batches shard over (data, fsdp); parameters shard over fsdp (largest
divisible axis) and optionally model. XLA inserts the all-gathers /
reduce-scatters; there are no explicit collectives in the train step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    fsdp: int = 1
    model: int = 1
    pipe: int = 1  # pipeline stages (GPipe schedule, core/pipeline.py)

    def resolve(self, n_devices: Optional[int] = None) -> tuple[int, int, int, int]:
        n = n_devices if n_devices is not None else jax.device_count()
        d, f, m, p = self.data, self.fsdp, self.model, self.pipe
        if d == -1:
            assert n % (f * m * p) == 0, (
                f"{n} devices not divisible by fsdp*model*pipe={f * m * p}")
            d = n // (f * m * p)
        # an explicit mesh may use a subset of the visible devices (e.g. a
        # small-batch job on a big slice); with data=-1 it must cover all
        assert d * f * m * p <= n, f"mesh {d}x{f}x{m}x{p} > {n} devices"
        return d, f, m, p


def _default_slice_of(dv) -> int:
    return getattr(dv, "slice_index", 0) or 0


def arrange_hybrid(devices, slice_of=None) -> list:
    """Order devices so same-slice devices are contiguous (multi-slice pods).

    On a multi-slice deployment the slices connect over DCN (slow) while
    chips within a slice ride ICI (fast). The mesh's LAST axes map to the
    fastest-varying device positions, so slice membership must vary slowest:
    all of slice 0, then all of slice 1, ... That way 'fsdp'/'model'
    collectives (all-gather, ppermute) stay intra-slice on ICI and only the
    'data'-axis gradient all-reduce crosses DCN — which GSPMD lowers
    hierarchically (reduce inside each slice, then across). With a single
    slice (or CPU devices, which have no ``slice_index``) the given order is
    returned untouched — an explicit caller-chosen layout is preserved.

    ``slice_of`` overrides the slice assignment (device -> slice id);
    default reads ``device.slice_index``. Virtual-device rehearsals inject a
    synthetic assignment here so the multi-slice layout/guard logic actually
    EXECUTES off-pod (CPU devices all report slice 0).
    """
    slice_of = slice_of or _default_slice_of
    slices = {slice_of(dv) for dv in devices}
    if len(slices) <= 1:
        return list(devices)
    return sorted(devices, key=lambda dv: (slice_of(dv), getattr(dv, "id", 0)))


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None, slice_of=None) -> Mesh:
    """Build the ('pipe','data','fsdp','model') mesh.

    Multi-slice: devices group by slice on the slowest axes via
    `arrange_hybrid`, keeping fsdp/model collectives on ICI. 'pipe' is the
    SLOWEST axis: with pipeline stages spanning slices, only the
    point-to-point boundary-activation ppermute crosses DCN (the canonical
    TPU multi-slice layout); with pipe=1 the mesh degrades to the r2
    ('data','fsdp','model') behavior exactly. For the layout to be
    DCN-clean, devices-per-slice must be divisible by fsdp*model (a slice
    boundary then always falls between 'data' rows).
    """
    devices = devices if devices is not None else jax.devices()
    devices = arrange_hybrid(devices, slice_of=slice_of)
    d, f, m, p = cfg.resolve(len(devices))
    slice_of = slice_of or _default_slice_of
    slice_counts: dict = {}
    for dv in devices[: d * f * m * p]:
        s = slice_of(dv)
        slice_counts[s] = slice_counts.get(s, 0) + 1
    if len(slice_counts) > 1:
        bad = {s: n for s, n in slice_counts.items() if n % (f * m)}
        assert not bad, (
            f"devices-per-slice {bad} not divisible by fsdp*model={f * m}: "
            "per-layer fsdp/model collectives would cross DCN every step; "
            "shrink fsdp/model or use whole slices"
        )
    dev_array = np.asarray(devices[: d * f * m * p]).reshape(p, d, f, m)
    return Mesh(dev_array, axis_names=("pipe", "data", "fsdp", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over both data-parallel axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def batch_spec() -> P:
    return P(("data", "fsdp"))


def _path_str(path: tuple) -> str:
    parts = []
    for p in path:
        parts.append(getattr(p, "key", getattr(p, "name", str(p))))
    return "/".join(str(x) for x in parts)


def param_spec(path: tuple, value, tp: bool = True, cp: bool = False) -> P:
    """Sharding rules over the ('fsdp', 'model') axes.

    * 'fsdp': ZeRO-3-style parameter sharding — largest dim of >=2D params.
    * 'model': Megatron-style tensor parallel for transformer matmuls —
      column-parallel qkv / mlp-in (output dim on 'model'), row-parallel
      attn-proj / mlp-out (input dim on 'model'). XLA/GSPMD inserts the
      all-reduce after row-parallel layers. Biases/LayerNorms replicated
      (GSPMD reshards as needed).

    With mesh model=1 these all degrade to the pure FSDP rule. ``tp=False``
    skips the 'model'-axis rules — used when the model axis carries
    ring-attention context parallelism (tokens, not tensors) instead. In
    that mode pass ``cp=True`` as well: every rank on the model axis applies
    identical params to its token shard, so the axis is *data-parallel with
    respect to parameters* and the ZeRO rule shards over the combined
    ('fsdp', 'model') axes — param/opt-state memory scales with the full
    ring, not just the fsdp axis.
    """
    if tp and cp:
        raise ValueError("the 'model' axis carries either tensors (tp) or "
                         "tokens (cp), not both")
    shape = value.shape
    if len(shape) < 2:
        return P()
    name = _path_str(path)
    if len(shape) == 2 and tp:
        d_in, d_out = shape
        is_qkv = "qkv/kernel" in name or name.endswith("kv/kernel")
        col_parallel = is_qkv or ("mlp/fc1" in name) or (d_out > d_in and "mlp" in name)
        row_parallel = ("attn/proj" in name) or ("mlp/fc3" in name) or (
            "mlp/fc2" in name and d_out < d_in
        )
        if col_parallel:
            return P("fsdp", "model")
        if row_parallel:
            return P("model", "fsdp")
    # default FSDP: shard the largest dim (over the ring too under CP)
    axis = int(np.argmax(shape))
    spec = [None] * len(shape)
    spec[axis] = ("fsdp", "model") if cp else "fsdp"
    return P(*spec)


def shard_params(params, mesh: Mesh):
    """Apply `param_spec` across a pytree and device_put accordingly."""
    def place(path, leaf):
        s = NamedSharding(mesh, param_spec(path, leaf))
        return jax.device_put(leaf, s)

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
