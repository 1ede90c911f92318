"""Collective-byte accounting from compiled HLO
(ace_tpu/parallel/comm_stats.py; evidence surface for SURVEY §5.8 /
BASELINE scaling-efficiency reporting on a 1-chip rig)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ace_tpu.parallel.comm_stats import (
    collective_byte_counts,
    compiled_collective_stats,
    format_comm_stats,
)


def test_parses_sync_and_async_forms():
    hlo = """
  %all-to-all.5 = f32[4,8,16]{2,1,0} all-to-all(f32[4,8,16]{2,1,0} %p), replica_groups={{0,1}}
  %ag = (bf16[8,4]{1,0}, bf16[16,4]{1,0}) all-gather-start(bf16[8,4]{1,0} %q), dimensions={0}
  %agd = bf16[16,4]{1,0} all-gather-done((bf16[8,4]{1,0}, bf16[16,4]{1,0}) %ag)
  %ar = f32[128]{0} all-reduce(f32[128]{0} %r), to_apply=%add
  ROOT %ar2 = f32[64]{0} all-reduce(f32[64]{0} %s), to_apply=%add
  %other = f32[4]{0} add(f32[4]{0} %a, f32[4]{0} %b)
"""
    stats = collective_byte_counts(hlo)
    assert stats["all-to-all"] == {"count": 1, "bytes": 4 * 8 * 16 * 4}
    # async all-gather: counted once, at the -start, with the gathered
    # (larger) tuple element
    assert stats["all-gather"] == {"count": 1, "bytes": 16 * 4 * 2}
    # includes the ROOT-form instruction (a collective as computation
    # root is common in while-bodies)
    assert stats["all-reduce"] == {"count": 2, "bytes": 128 * 4 + 64 * 4}
    assert "collective-permute" not in stats
    s = format_comm_stats(stats)
    assert "all-to-all:n=1" in s
    assert format_comm_stats({}) == "none"


def test_compiled_mesh_program_reports_psum():
    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("data",))
    sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def f(x):
        return jax.lax.with_sharding_constraint(
            jnp.broadcast_to(jnp.sum(x), x.shape), sharding
        )

    x = jax.device_put(jnp.arange(16.0), sharding)
    compiled = f.lower(x).compile()
    stats = compiled_collective_stats(compiled)
    total = sum(v["count"] for v in stats.values())
    assert total >= 1, f"expected a collective in {compiled.as_text()[:500]}"
