#!/usr/bin/env python
"""On-chip precision probe for in-kernel reductions (one rung per process).

The fused train step executes on the chip but misses the CPU trace by
~6e-3 relative on the very first energy (tpu_step_fused run, 2026-08-17);
the screen kernel was accepted at 2.4e-3 "reduction-order noise".  f32
reduction reordering explains ~1e-6, not 1e-3 -- the suspect is Mosaic
lowering ``jnp.sum`` (or the product inputs feeding it) through a
bf16-truncating MXU pass inside the kernel.

Rungs (all zero-poison: nothing but the salted program is dispatched):
  sum        out = jnp.sum(x) over a random (2048, 128) f32 plane
  sum_hier   out = jnp.sum(jnp.sum(x, axis=1)) (explicit two-stage)
  dot_ones   out = x @ ones then sum (deliberate MXU path, default prec)
  expect1    one real expectation term: sum(s * (re*tre + im*tim))
             with xb=0b1010100, zb pattern (exercises permute+sign+sum)

Each rung compares against the host float64 reference and prints the
relative error.  Appends to tpu_sum_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

ROWS, LANE = 2048, 128  # 18-qubit plane shape


def main() -> int:
    rung = sys.argv[1]
    salt = np.float32((time.time() % 86400) * 1e-9)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    x_np = rng.standard_normal((ROWS, LANE)).astype(np.float32)
    y_np = rng.standard_normal((ROWS, LANE)).astype(np.float32)

    from qsfh_tpu.engine.pallas_kernels import _parity_sign, _xor_permute

    def make_kernel(body):
        def kernel(x_ref, y_ref, out_ref):
            out_ref[:] = jnp.zeros((8, LANE), jnp.float32) + body(
                x_ref[:], y_ref[:]
            )
        return kernel

    bodies = {
        "sum": lambda x, y: jnp.sum(x) + salt,
        "sum_hier": lambda x, y: jnp.sum(jnp.sum(x, axis=1)) + salt,
        "dot_ones": lambda x, y: jnp.sum(
            jnp.dot(x, jnp.ones((LANE, LANE), jnp.float32))[:, 0]
        )
        + salt,
        "expect1": lambda x, y: jnp.sum(
            _parity_sign(np.uint32(0b1110001101), ROWS)
            * (x * _xor_permute(x, np.uint32(0b1010100), ROWS)
               + y * _xor_permute(y, np.uint32(0b1010100), ROWS))
        )
        + salt,
    }

    # float64 host references
    xb, zb = 0b1010100, 0b1110001101
    idx = np.arange(ROWS * LANE, dtype=np.uint64)
    s = 1.0 - 2.0 * (np.bitwise_count(idx & np.uint64(zb)) & 1).astype(np.float64)
    tx = x_np.reshape(-1)[idx ^ np.uint64(xb)].astype(np.float64)
    ty = y_np.reshape(-1)[idx ^ np.uint64(xb)].astype(np.float64)
    refs = {
        "sum": x_np.astype(np.float64).sum(),
        "sum_hier": x_np.astype(np.float64).sum(),
        "dot_ones": x_np.astype(np.float64).sum() * LANE / LANE,  # x@ones col0 = row sums
        "expect1": float(
            (s * (x_np.reshape(-1).astype(np.float64) * tx
                  + y_np.reshape(-1).astype(np.float64) * ty)).sum()
        ),
    }

    rec = {"rung": rung}
    t0 = time.time()
    try:
        call = pl.pallas_call(
            make_kernel(bodies[rung]),
            out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.devices()[0].platform == "cpu",
        )
        out = float(jax.jit(lambda a, b: call(a, b)[0, 0])(x_np, y_np))
        out -= float(salt)
        ref = refs[rung]
        rel = abs(out - ref) / max(abs(ref), 1e-12)
        rec.update(ok=True, s=round(time.time() - t0, 1), value=out,
                   ref=ref, rel_err=rel)
    except Exception as e:  # noqa: BLE001
        rec.update(ok=False, s=round(time.time() - t0, 1),
                   err=str(e).split("\n")[0][:120])
    with open(os.path.join(HERE, "tpu_sum_probe.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if rec.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
