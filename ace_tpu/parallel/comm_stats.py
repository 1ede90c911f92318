"""Collective-communication accounting from compiled XLA programs.

A 1-chip rig cannot measure multi-chip scaling, but the compiled HLO of
a mesh-sharded program is exact evidence of what WOULD move over ICI:
every all-to-all / all-reduce / all-gather / reduce-scatter /
collective-permute instruction and its operand bytes. The dryrun
(driver: __graft_entry__.dryrun_multichip) emits these counts so the
spatial-parallel comm story is reviewable without N real chips
(reference comparison point: the reference's distributed SHT wraps NCCL
all-to-alls in fme/ace/models/makani mpu layers; SURVEY §5.8).
"""

import re
from typing import Any, Mapping

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1,
    "f8e5m2": 1, "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "c64": 8,
    "c128": 16,
}

# the collective HLO opcodes that ride the interconnect
_COLLECTIVES = (
    "all-to-all",
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
)

# one typed shape like f32[2,16,32]{3,2,1,0:T(8,128)} or bf16[8]
_SHAPE_RE = re.compile(r"\b([a-z][a-z0-9]*)\[([\d,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    """Sum bytes over every typed shape in ``shape_text`` (handles
    tuple shapes by matching each element)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_byte_counts(hlo_text: str) -> dict[str, dict[str, int]]:
    """Per-collective-kind instruction counts and output bytes from
    optimized HLO text.

    Bytes are the collective's OUTPUT shape bytes — the standard
    per-instruction proxy for interconnect traffic (all-gather outputs
    the gathered tensor; reduce-scatter outputs the scattered shard;
    ring algorithms move ~(n-1)/n of it per hop).
    """
    stats: dict[str, dict[str, int]] = {
        k: {"count": 0, "bytes": 0} for k in _COLLECTIVES
    }
    op_re = re.compile(
        r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*?)\s+("
        + "|".join(re.escape(k) for k in _COLLECTIVES)
        + r")(-start|-done)?\("
    )
    for line in hlo_text.splitlines():
        m = op_re.match(line.strip())
        if not m:
            continue
        shape_text, opcode, suffix = m.groups()
        if suffix == "-done":
            continue  # counted at the -start
        if suffix == "-start":
            # async form carries a tuple (operand, result, ...): take
            # the largest single element as the transferred tensor
            sizes = [
                _shape_bytes(f"{d}[{dims}]")
                for d, dims in _SHAPE_RE.findall(shape_text)
            ]
            nbytes = max(sizes, default=0)
        else:
            nbytes = _shape_bytes(shape_text)
        stats[opcode]["count"] += 1
        stats[opcode]["bytes"] += nbytes
    return {k: v for k, v in stats.items() if v["count"]}


def compiled_collective_stats(compiled: Any) -> dict[str, dict[str, int]]:
    """Collective stats for a jax ``Compiled`` object."""
    return collective_byte_counts(compiled.as_text())


def format_comm_stats(stats: Mapping[str, Mapping[str, int]]) -> str:
    parts = [
        f"{k}:n={v['count']},MB={v['bytes'] / 1e6:.2f}"
        for k, v in sorted(stats.items())
    ]
    return " ".join(parts) if parts else "none"
