"""A/B: Pallas fused GroupNorm+affine+SiLU vs the XLA lowering.

Round-4 VERDICT "do this" #7: the train-step roofline
(docs/PERFORMANCE.md) shows the backward pass HBM-bound at 75% with
activation re-reads across norm boundaries named as the remedy target.
This measures the candidate remedy — fea_tpu/ops/fused_norm.py, which
makes ONE HBM read of x per norm+silu chain by keeping a batch
element's activations VMEM-resident — against the stock flax
GroupNorm -> affine -> silu chain XLA compiles, at every FDN-UNet stage
shape of the production flagship (256px, input_dim 64, dims
64/128/256/512 at HW 256^2/128^2/64^2/32^2, bf16, micro-batch 8).

Timing is tunnel-robust: K forwards (or grads) chained through a
lax.scan data dependency in one dispatch, wall / K, best of 3.

Usage:
  timeout 1800 python benchmarks/fused_norm_ab.py [--json] [--cpu]
      [--out docs/fused_norm_ab.json]
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from fea_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from fea_tpu.ops.fused_norm import fits_vmem, group_norm_silu

# production flagship stage shapes at 256px / input_dim 64 / 4 stages
STAGES = [
    (65536, 64),
    (16384, 128),
    (4096, 256),
    (1024, 512),
]
G = 8
B = 8
K = 20


_RTT = None


def _rtt():
    """Pure tunnel-RTT baseline (block_until_ready is not trustworthy on
    the tunneled runtime — benchmarks/inference_latency.py measured it
    returning before execution; only a host fetch provably waits)."""
    global _RTT
    if _RTT is None:
        ready = jnp.zeros((1, 1), jnp.float32) + 1.0
        np.asarray(ready)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(ready)
            best = min(best, time.perf_counter() - t0)
        _RTT = best
    return _RTT


def bench(fn, *args, n=K):
    """fn returns a tiny array; time dispatch + 1-element fetch minus
    the RTT baseline, divided by the chain length."""
    rtt = _rtt()
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        wall = time.perf_counter() - t0
        best = min(best, max(wall - rtt, 0.0) / n)
    return best


def xla_gn_silu(x, gamma, beta):
    # exactly flax nn.GroupNorm(G, use_bias=False, use_scale=False) ->
    # affine -> silu, written out so both sides lower the same math
    b, hw, c = x.shape
    xg = x.reshape(b, hw, G, c // G).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xh = ((xg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(b, hw, c)
    z = xh * gamma + beta
    return (z * jax.nn.sigmoid(z)).astype(x.dtype)


def main():
    emit_json = "--json" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    dt = jnp.bfloat16
    rows = []
    for hw, c in STAGES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, hw, c)), dt)
        gamma = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        beta = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(B, hw, c)), dt)
        # ideal one-read-one-write HBM floor for the fwd chain (bytes)
        bytes_fwd_floor = 2 * B * hw * c * 2

        def chain_fwd(f):
            @jax.jit
            def run(x, gamma, beta):
                def body(xc, _):
                    return f(xc, gamma, beta), None

                out, _ = jax.lax.scan(body, x, None, length=K)
                return out[:1, :1, :1]

            return run

        def chain_grad(f):
            loss = lambda x, gamma, beta: jnp.sum(
                (f(x, gamma, beta) * ct).astype(jnp.float32)
            )
            g = jax.grad(loss)

            @jax.jit
            def run(x, gamma, beta):
                def body(xc, _):
                    return g(xc, gamma, beta).astype(xc.dtype), None

                out, _ = jax.lax.scan(body, x, None, length=K)
                return out[:1, :1, :1]

            return run

        fused = lambda x, gamma, beta: group_norm_silu(x, gamma, beta, G)
        row = {"hw": hw, "channels": c, "batch": B, "dtype": "bfloat16"}
        t = bench(chain_fwd(xla_gn_silu), x, gamma, beta)
        row["xla_fwd_ms"] = round(t * 1e3, 3)
        row["xla_fwd_gbps"] = round(bytes_fwd_floor / t / 1e9, 1)
        t = bench(chain_grad(xla_gn_silu), x, gamma, beta)
        row["xla_grad_ms"] = round(t * 1e3, 3)

        if fits_vmem(hw, c, 2, 2):
            t = bench(chain_fwd(fused), x, gamma, beta)
            row["fused_fwd_ms"] = round(t * 1e3, 3)
            row["fused_fwd_gbps"] = round(bytes_fwd_floor / t / 1e9, 1)
            row["fwd_speedup"] = round(row["xla_fwd_ms"] / row["fused_fwd_ms"], 2)
            if fits_vmem(hw, c, 2, 3):  # bwd holds x + dy + dx
                t = bench(chain_grad(fused), x, gamma, beta)
                row["fused_grad_ms"] = round(t * 1e3, 3)
                row["grad_speedup"] = round(
                    row["xla_grad_ms"] / row["fused_grad_ms"], 2
                )
            else:
                row["fused_grad"] = "skipped: bwd blocks exceed VMEM budget"
            # numeric agreement at this shape
            y0 = xla_gn_silu(x, gamma, beta).astype(jnp.float32)
            y1 = fused(x, gamma, beta).astype(jnp.float32)
            row["fwd_max_abs_err"] = float(jnp.abs(y0 - y1).max())
        else:
            row["fused"] = "skipped: blocks exceed VMEM budget"
        rows.append(row)
        if not emit_json:
            print(row, flush=True)

    result = {
        "platform": jax.devices()[0].platform,
        "batch": B,
        "chain_length": K,
        "rows": rows,
    }
    if emit_json:
        print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
