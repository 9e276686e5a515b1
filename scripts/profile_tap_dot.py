"""Microbench the sweep tap-dot formulations (device profiler).

The encoder profile shows the pair-scan sweep's per-tap einsum
("cbp,cbdp->bdp", bf16 inputs, preferred f32) splitting into a
bitcast-convert fusion that MATERIALIZES the f32-converted tap values
(~223 ms of the 690 ms sweep total at headline scale — pure extra HBM
traffic) followed by the multiply-reduce (~97 ms). Candidates:

  v1  current einsum with preferred_element_type=f32
  v2  explicit f32 upcast then multiply+sum (same math, maybe same split)
  v3  bf16 multiply, f32-convert inside the sum (products rounded to bf16 —
      ~1e-3-class cost-volume change, same class as the bf16 gather knob)
  v4  bf16 multiply with bf16 accumulation (precision risk; reference point)

Run on the real TPU: python scripts/profile_tap_dot.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts._prof_util import device_total  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np


def profile(tag, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    d = f"/tmp/tapdot_{tag}"
    jax.profiler.start_trace(d)
    r = f(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    ms = device_total(d)
    print(f"{tag:10s} {ms:8.2f} ms", flush=True)
    return ms, r


def main() -> None:
    # one headline scale-0 sweep iteration's tap: c=128, d=128, hw=64*120
    c, b, d, hw = 128, 1, 128, 64 * 120
    rng = np.random.default_rng(0)
    vals = jnp.asarray(
        rng.normal(size=(c, b, d, hw)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = jnp.asarray(
        rng.normal(size=(c, b, hw)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def v1(ref, vals):
        return jnp.einsum(
            "cbp,cbdp->bdp", ref, vals, preferred_element_type=jnp.float32
        )

    def v2(ref, vals):
        return jnp.sum(
            vals.astype(jnp.float32) * ref.astype(jnp.float32)[:, :, None, :],
            axis=0,
        )

    def v3(ref, vals):
        return jnp.sum(
            (vals * ref[:, :, None, :]).astype(jnp.float32), axis=0
        )

    def v4(ref, vals):
        return jnp.sum(vals * ref[:, :, None, :], axis=0).astype(jnp.float32)

    _, r1 = profile("v1_einsum", v1, ref, vals)
    _, r2 = profile("v2_f32mul", v2, ref, vals)
    _, r3 = profile("v3_bf16mul", v3, ref, vals)
    _, r4 = profile("v4_bf16acc", v4, ref, vals)
    a1 = np.asarray(r1, np.float32)
    for tag, r in (("v2", r2), ("v3", r3), ("v4", r4)):
        rel = np.abs(np.asarray(r, np.float32) - a1).max() / (
            np.abs(a1).max() + 1e-8
        )
        print(f"  {tag} vs v1 max rel diff: {rel:.2e}")


if __name__ == "__main__":
    main()
