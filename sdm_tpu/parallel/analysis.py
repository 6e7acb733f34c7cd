"""Communication cost analysis of compiled SPMD programs.

The reference has no distributed code at all (SURVEY.md §2.10), so there is
nothing to match here — this is the TPU build's own tooling for deciding
*when tensor parallelism pays*: compile a train step under a candidate mesh,
then count the bytes every XLA-inserted collective moves. Used by
tests/test_tp.py and the dp-vs-tp analysis recorded in ARCHITECTURE.md.

The model behind the numbers (scaling-book recipe):
  - Pure DP moves exactly one gradient all-reduce per step: 2*(n-1)/n *
    param_bytes per chip over ICI, independent of batch.
  - TP shards wide conv kernels over "model"; the partitioner then inserts
    activation all-gathers/reduce-scatters whose size scales with
    batch * H * W * C at every cut layer — so TP only wins when the model is
    too big for a chip (not the case here: 127 M params ~ 1.5 GB fp32+Adam)
    or when batch-per-chip is so small the DP all-reduce dominates.
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

# e.g. "%all-gather.7 = bf16[3,3,128,256]{...} all-gather(...)"; tuple-shaped
# collectives appear as "(f32[...], f32[...]) all-reduce(...)".
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|f8|s64|s32|s16|s8|u64|u32|u16|u8"
                       r"|pred)\[([0-9,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def collective_bytes(hlo_text: str) -> Dict[str, int]:
    """Bytes produced by each collective kind in an HLO module dump
    (per participating device — HLO shapes in SPMD modules are per-shard
    for the inputs and full for all-gather outputs; we count the op's
    *output* shapes, the data actually landing in each chip's HBM)."""
    totals = {k: 0 for k in _COLLECTIVES}
    totals["total"] = 0
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"^(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*)$", line)
        if not m:
            continue
        rhs = m.group(1)
        kind = next((k for k in _COLLECTIVES
                     if re.search(rf"\b{k}(-start|-done)?\(", rhs)), None)
        if kind is None:
            continue
        if re.search(rf"\b{kind}-start\(", rhs):
            # Async collectives: the -start op's tuple mixes operand
            # aliases, results and (for collective-permute / combined
            # collectives) extra context elements — its shape list is not a
            # reliable byte count. The paired -done op's output IS exactly
            # the result landing in HBM, so count that line instead.
            continue
        # Output shape(s) precede the op name on the RHS.
        head = rhs.split(kind)[0]
        shapes = _SHAPE_RE.findall(head)
        nbytes = sum(_shape_bytes(d, s) for d, s in shapes)
        totals[kind] += nbytes
        totals["total"] += nbytes
    return totals


def compiled_collective_bytes(jitted, *args, **kwargs) -> Dict[str, int]:
    """Lower+compile a jitted function and analyze its optimized HLO."""
    compiled = jitted.lower(*args, **kwargs).compile()
    return collective_bytes(compiled.as_text())
