"""SPMD partitioning for Pallas kernels.

A `pallas_call` under a sharded jit has no GSPMD partitioning rule: the
partitioner either fails outright (reproduced: spmd_partitioner RET_CHECK
"side-effect HLO cannot have a replicated sharding" on an 8-device mesh) or
replicates the computation. Every kernel in this package is embarrassingly
parallel over its leading batch axis, so `batch_partitioned` teaches GSPMD
to run the kernel on each device's dim-0 shard — the reference has no
distributed code to mirror here (SURVEY.md §2.10); this is what makes the
kernels composable with the framework's data-parallel train/sample steps.

Both partitioner generations are covered: a Shardy einsum `sharding_rule`
(dims other than batch marked need-replication) and the classic
infer/partition callbacks. Pallas TPU *interpret mode* (CPU tests) lowers
through an ordered io_callback that cannot be partitioned — callers bypass
the wrapper there via `tpu_interpret_mode()`.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def tpu_interpret_mode() -> bool:
    """True inside pltpu.force_tpu_interpret_mode() (CPU kernel tests).

    Detection order: the explicit SDM_TPU_PALLAS_INTERPRET env override
    (0/1; lets callers pin the answer without relying on jax internals),
    then the private jax config flag the context manager sets. If a jax
    upgrade removes that flag we raise instead of silently answering False —
    a wrong False here routes interpret-mode kernels through
    custom_partitioning (unpartitionable io_callback) and fails confusingly
    far from the cause."""
    env = os.environ.get("SDM_TPU_PALLAS_INTERPRET")
    if env is not None:
        return env not in ("", "0", "false", "False")
    try:
        from jax._src import config as _jax_config
        ctx = _jax_config.pallas_tpu_interpret_mode_context_manager
    except (ImportError, AttributeError) as e:
        raise RuntimeError(
            "Cannot detect Pallas TPU interpret mode: jax no longer exposes "
            "_src.config.pallas_tpu_interpret_mode_context_manager. Set "
            "SDM_TPU_PALLAS_INTERPRET=0/1 explicitly (tests set 1 alongside "
            "pltpu.force_tpu_interpret_mode())." ) from e
    return ctx.value is not None


def batch_partitioned(fn, sharding_rule: str,
                      need_replication: Tuple[str, ...],
                      batch_argnums: Optional[Sequence[int]] = None):
    """Wrap `fn` (arrays in -> array or tuple of arrays out) so GSPMD
    partitions it over dim 0 of the batch-leading arguments only.

    `sharding_rule` is the Shardy einsum rule with `b` (or `n`) as the batch
    factor; every other factor must be listed in `need_replication`.
    `batch_argnums` selects which arguments carry the batch axis on dim 0
    (default: all of them); the rest are fully replicated. All outputs must
    be batch-leading.
    """
    cp = custom_partitioning(fn)

    def _is_batch(idx):
        return batch_argnums is None or idx in batch_argnums

    def _dim0(arg_shapes):
        for i, a in enumerate(jax.tree.leaves(arg_shapes)):
            sh = getattr(a, "sharding", None)
            if (_is_batch(i) and isinstance(sh, NamedSharding)
                    and len(sh.spec) and sh.spec[0]):
                return sh.mesh, sh.spec[0]
        return None, None

    def _arg_shardings(mesh, b, arg_shapes):
        return tuple(
            NamedSharding(mesh, P(b, *([None] * (x.ndim - 1))))
            if _is_batch(i) else NamedSharding(mesh, P(*([None] * x.ndim)))
            for i, x in enumerate(jax.tree.leaves(arg_shapes)))

    def _out_shardings(mesh, b, result_shape):
        return jax.tree.map(
            lambda x: NamedSharding(mesh, P(b, *([None] * (x.ndim - 1)))),
            result_shape)

    def infer(mesh, arg_shapes, result_shape):
        m, b = _dim0(arg_shapes)
        return _out_shardings(m or mesh, b, result_shape)

    def partition(mesh, arg_shapes, result_shape):
        m, b = _dim0(arg_shapes)
        m = m or mesh
        return (m, fn, _out_shardings(m, b, result_shape),
                _arg_shardings(m, b, arg_shapes))

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        propagate_user_sharding=lambda sharding, shape: sharding,
        sharding_rule=sharding_rule,
        need_replication_factors=tuple(need_replication))
    return cp
