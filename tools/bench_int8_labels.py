"""int8 label-production encoder: measured throughput ratio + agreement gate.

Closes the ROADMAP "int8 label production" item (deferred in round 2 because
single-op timings on the tunneled transport sit on the ~1 ms dispatch floor).
This measures the pero_vgg FQ encoder (scripts/common.py::init_feature_model,
reference analogue scripts/produce_kmeans_labels.py:27-87) in three numeric
modes, OFF the dispatch floor by fusing M encoder passes into one device
program with lax.scan:

- parity: fp32 HIGHEST matmuls (the shipped default — bit-comparable targets)
- fast:   bf16 MXU matmuls (the shipped --precision fast)
- int8:   s8 x s8 -> s32 convolutions, per-output-channel symmetric weight
          quantization, dynamic per-tensor activation quantization; BatchNorm
          and the k-means assignment stay fp32.

Quality gate: FQ labels (k-means over parity features, assignment via
ops/vq.py) produced from int8/bf16 features vs parity features — percentage
of frames whose label flips. Writes docs/bench_int8.json.

Caveat recorded in the output: the encoder here is randomly initialized (no
trained pero_vgg checkpoint ships with the repo); agreement numbers gate the
NUMERIC pipeline and must be re-run on the production checkpoint before
switching label production to int8.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_HERE = os.path.dirname(os.path.abspath(__file__))
OUT_PATH = os.path.join(_HERE, "..", "docs", "bench_int8.json")

BATCH = 32
WIDTH = 2048
M = 4  # encoder passes fused per device program (off the dispatch floor)
K = 512  # k-means codebook for the agreement gate


def _init_encoder():
    from pero_pretraining_tpu.models.vgg import PeroVggEncoder

    model = PeroVggEncoder()
    dummy = jnp.zeros((1, 40, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))()
    return model, jax.device_get(variables)


# ---------------------------------------------------------------- int8 path

def _quantize_weights(params):
    """Per-output-channel symmetric int8 for every conv kernel; biases fp32."""
    q = {}
    stack = params["blocks_2d"]
    for name, leaf in stack.items():
        if name == "bn":
            continue
        w = np.asarray(leaf["kernel"], np.float32)
        scale = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
        scale = np.maximum(scale, 1e-12)
        q[name] = (
            np.clip(np.round(w / scale), -127, 127).astype(np.int8),
            scale.astype(np.float32),
            np.asarray(leaf["bias"], np.float32),
        )
    w = np.asarray(params["aggregation_conv"]["kernel"], np.float32)
    scale = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0, 1e-12)
    q["aggregation_conv"] = (
        np.clip(np.round(w / scale), -127, 127).astype(np.int8),
        scale.astype(np.float32),
        np.asarray(params["aggregation_conv"]["bias"], np.float32),
    )
    bn = params["blocks_2d"]["bn"]
    q["bn"] = (np.asarray(bn["scale"], np.float32), np.asarray(bn["bias"], np.float32))
    return q


def _conv_s8(x_fp, wq, w_scale, bias, window_strides=(1, 1), padding="SAME"):
    """Dynamic per-tensor activation quantization -> s8xs8->s32 conv -> fp32."""
    a_scale = jnp.maximum(jnp.max(jnp.abs(x_fp)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x_fp / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=window_strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (a_scale * w_scale) + bias


def _encode_int8(q, images):
    """PeroVggEncoder forward with int8 convs (plan mirrors models/vgg.py:
    PeroVggStack 64-64|128-128|256-256-256|512-512, pools (2,2)x3+(2,1),
    LeakyReLU on the 512 block, BatchNorm(512), aggregation conv)."""
    plan = [(2, "relu", (2, 2)), (2, "relu", (2, 2)), (3, "relu", (2, 2)), (2, "leaky", (2, 1))]
    x = images
    for b, (n_convs, act, pool) in enumerate(plan):
        for j in range(n_convs):
            wq, ws, bias = q[f"block{b}_conv{j}"]
            x = _conv_s8(x, wq, ws, bias)
            x = jax.nn.relu(x) if act == "relu" else jax.nn.leaky_relu(x, 0.01)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1,) + pool + (1,), (1,) + pool + (1,), "VALID"
        )
    bn_scale, bn_bias = q["bn"]
    x = x * bn_scale + bn_bias  # init running stats are mean 0 / var 1
    wq, ws, bias = q["aggregation_conv"]
    x = _conv_s8(x, wq, ws, bias, padding="VALID")
    x = jax.nn.leaky_relu(x, 0.01)
    return x[:, 0]  # (N, S, D)


# ------------------------------------------------------------- fp32 / bf16

def _encode_fp(model, variables, images, dtype):
    x = model.apply(variables, images.astype(dtype), train=False)
    return x[:, 0].astype(jnp.float32) if x.ndim == 4 else x.astype(jnp.float32)


# ----------------------------------------------------------------- harness

def measure(encode_many, stacked, trials=3):
    out = encode_many(stacked)  # compile + warm
    float(out)
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        float(encode_many(stacked))
        best = max(best, M * BATCH / (time.perf_counter() - t0))
    return best


def main():
    model, variables = _init_encoder()
    q = _quantize_weights(variables["params"])
    q_dev = jax.device_put(q)
    vars_dev = jax.device_put(variables)

    rng = np.random.RandomState(0)
    stacked = jnp.asarray(
        rng.randint(0, 256, size=(M, BATCH, 40, WIDTH, 3)).astype(np.float32) / 255.0
    )

    def scan_sum(encode_one):
        @jax.jit
        def run(batches):
            def step(carry, b):
                return carry + jnp.sum(encode_one(b)), None
            total, _ = jax.lax.scan(step, jnp.float32(0.0), batches)
            return total
        return run

    legs = {}
    with jax.default_matmul_precision("highest"):
        legs["parity_fp32"] = measure(scan_sum(lambda b: _encode_fp(model, vars_dev, b, jnp.float32)), stacked)
    with jax.default_matmul_precision("default"):
        legs["fast_bf16"] = measure(scan_sum(lambda b: _encode_fp(model, vars_dev, b, jnp.bfloat16)), stacked)
        legs["int8"] = measure(scan_sum(lambda b: _encode_int8(q_dev, b)), stacked)
    for name, rate in legs.items():
        print(f"{name}: {rate:.1f} lines/s", flush=True)

    # agreement gate: FQ labels from each mode vs the parity labels
    from pero_pretraining_tpu.ops.kmeans import fit_minibatch_kmeans
    from pero_pretraining_tpu.ops.vq import vq_assign

    small = stacked[0][:16]  # one batch of frames is plenty (16*256 = 4096 frames)
    with jax.default_matmul_precision("highest"):
        f_parity = np.asarray(_encode_fp(model, vars_dev, small, jnp.float32)).reshape(-1, 768)
    with jax.default_matmul_precision("default"):
        f_bf16 = np.asarray(_encode_fp(model, vars_dev, small, jnp.bfloat16)).reshape(-1, 768)
        f_int8 = np.asarray(_encode_int8(q_dev, small)).reshape(-1, 768)
    centers, _ = fit_minibatch_kmeans(f_parity, K, batch_size=2048, epochs=4, seed=0)
    centers = jnp.asarray(centers)
    l_parity = np.asarray(vq_assign(jnp.asarray(f_parity), centers))
    agree = {
        "bf16_vs_parity_pct": round(100.0 * float(np.mean(np.asarray(vq_assign(jnp.asarray(f_bf16), centers)) == l_parity)), 2),
        "int8_vs_parity_pct": round(100.0 * float(np.mean(np.asarray(vq_assign(jnp.asarray(f_int8), centers)) == l_parity)), 2),
    }
    print(agree, flush=True)

    report = {
        "workload": f"pero_vgg encoder b{BATCH} w{WIDTH}, lax.scan x{M} fused, best of 3",
        "lines_per_sec": {k: round(v, 1) for k, v in legs.items()},
        "speedup_int8_vs_fast": round(legs["int8"] / legs["fast_bf16"], 2),
        "speedup_fast_vs_parity": round(legs["fast_bf16"] / legs["parity_fp32"], 2),
        "label_agreement": agree,
        "agreement_setup": f"k-means k={K} fit on parity features, {l_parity.size} frames",
        "caveat": "randomly initialized encoder (no trained pero_vgg checkpoint ships); "
                  "re-gate agreement on the production checkpoint before adopting int8",
    }
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ("lines_per_sec", "speedup_int8_vs_fast", "label_agreement")}))


if __name__ == "__main__":
    main()
