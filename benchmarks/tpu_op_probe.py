#!/usr/bin/env python
"""One-dispatch on-chip diagnostic: which kernel op is numerically lossy?

tpu_sum_probe.jsonl showed in-kernel jnp.sum accurate to 4e-7 while a
parity-cancelling expectation term returned -0.52 where the exact value
is 0 — errors ~5000x beyond f32, in bf16-truncation territory.  This
kernel isolates each suspect against HOST-COMPUTED references fed as
inputs, returning all diagnostics in one (8, 128) tile:

  out[0,0]  sum(|xor_permute(x, xb) - y_perm|)   permute exactness
  out[0,1]  max(|xor_permute(x, xb) - y_perm|)   (per-element worst case)
  out[0,2]  sum(|parity_sign(zb) - y_sign|)      sign exactness
  out[0,3]  |sum(x*y) - ref_prod| / |ref_prod|   product+reduce accuracy
  out[0,4]  sum(x) (accuracy control, known good)

Appends to tpu_op_probe.jsonl.
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

ROWS, LANE = 2048, 128
XB, ZB = 0b1010100, 0b1110001101


def main() -> int:
    salt = np.float32((time.time() % 86400) * 1e-9)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from qsfh_tpu.engine.pallas_kernels import _parity_sign, _xor_permute

    rng = np.random.default_rng(11)
    x_np = rng.standard_normal((ROWS, LANE)).astype(np.float32)
    y_np = rng.standard_normal((ROWS, LANE)).astype(np.float32)

    idx = np.arange(ROWS * LANE, dtype=np.uint64)
    perm_np = x_np.reshape(-1)[idx ^ np.uint64(XB)].reshape(ROWS, LANE)
    sign_np = (
        1.0 - 2.0 * (np.bitwise_count(idx & np.uint64(ZB)) & 1)
    ).astype(np.float32).reshape(ROWS, LANE)
    ref_prod = float(
        (x_np.astype(np.float64) * y_np.astype(np.float64)).sum()
    )

    def kernel(x_ref, y_ref, perm_ref, sign_ref, out_ref):
        x = x_ref[:]
        y = y_ref[:]
        t = _xor_permute(x, np.uint32(XB), ROWS)
        s = _parity_sign(np.uint32(ZB), ROWS)
        d_perm = jnp.abs(t - perm_ref[:])
        d_sign = jnp.abs(s - sign_ref[:])
        vals = [
            jnp.sum(d_perm),
            jnp.max(d_perm),
            jnp.sum(d_sign),
            jnp.abs(jnp.sum(x * y) - np.float32(ref_prod)),
            jnp.sum(x),
        ]
        tile = jnp.zeros((8, LANE), jnp.float32) + salt
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
        for i, v in enumerate(vals):
            tile = jnp.where(lane == i, v, tile)
        out_ref[:] = tile

    rec = {}
    t0 = time.time()
    try:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.devices()[0].platform == "cpu",
        )
        out = np.asarray(
            jax.jit(lambda *a: call(*a)[0, :8])(x_np, y_np, perm_np, sign_np)
        )
        rec.update(
            ok=True,
            s=round(time.time() - t0, 1),
            perm_abs_sum=float(out[0]),
            perm_abs_max=float(out[1]),
            sign_abs_sum=float(out[2]),
            prod_abs_err=float(out[3]),
            prod_rel_err=float(out[3]) / abs(ref_prod),
            sum_x=float(out[4]),
            sum_x_rel_err=abs(float(out[4]) - x_np.astype(np.float64).sum())
            / abs(x_np.astype(np.float64).sum()),
            platform=jax.devices()[0].platform,
        )
    except Exception as e:  # noqa: BLE001
        rec.update(ok=False, s=round(time.time() - t0, 1),
                   err=str(e).split("\n")[0][:120])
    with open(os.path.join(HERE, "tpu_op_probe.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if rec.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
