"""Memory evidence that ring attention and FSDP are load-bearing.

Round-2 shipped both features with exact-equality tests but no demonstration
of the footprint they exist to cut. This produces that evidence on the
8-virtual-device CPU mesh (run with JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8):

1. ring: compile (AOT, no execution) the masked train step fwd+bwd at a
   packed long-line config (S = 16384 frames = 131072-px fill-width lines)
   for (a) the XLA attention path on a data=8 mesh and (b) ring attention on
   a seq=8 mesh, and compare per-device compiled memory
   (jax .compile().memory_analysis()): the XLA path materializes O(S^2)
   attention intermediates per device, ring keeps O((S/n)^2) per hop.
   Compiled-memory numbers are backend-specific (CPU here), but the
   asymptotic per-device scaling they demonstrate is the design property.
2. fsdp: init a scaled model (~0.2B params) on a data=8 mesh with and
   without --fsdp and measure the ACTUAL per-device bytes held by params and
   Adam moments (addressable_shards) — physical residency, not annotations.

Writes docs/bench_memory.json; summarized in docs/SCALING.md.
"""

from __future__ import annotations

import json
import os

import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# force the 8-virtual-device CPU platform even when sitecustomize pins the
# TPU plugin (env JAX_PLATFORMS alone is not enough; see tests/conftest.py)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
OUT_PATH = os.path.join(_HERE, "..", "docs", "bench_memory.json")

GIB = float(1 << 30)
V5E_HBM_GIB = 16.0


def _ring_leg():
    import jax
    import jax.numpy as jnp

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.parallel.sharding import batch_sharding, replicated
    from pero_pretraining_tpu.pipelines.masked import MaskedTask

    S, BATCH, LABELS = 16384, 8, 128
    WIDTH = S * 8
    bb = BackboneConfig(type="vit", model_dim=512, num_heads=4, num_blocks=2,
                        feedforward_dim=2048, max_len=S, random_shift=False)
    head = HeadConfig(in_features=512, out_features=LABELS)
    tc = TrainingConfig(masking_prob=0.15)

    rng = np.random.RandomState(0)
    small = synthetic_masked_batch(rng, batch_size=1, width=256, num_labels=LABELS)

    def compiled_stats(task, mesh):
        variables = dict(task.init_variables(jax.random.PRNGKey(0), small))
        params = jax.device_put(variables.pop("params"), replicated(mesh))
        mstate = jax.device_put(variables, replicated(mesh))

        def loss(p, ms, images, labels):
            batch = {"images": images, "labels": labels}
            value, _ = task.loss_fn(p, ms, batch, jax.random.PRNGKey(1), True)
            return value

        step = jax.jit(jax.value_and_grad(loss))
        img_sds = jax.ShapeDtypeStruct((BATCH, 40, WIDTH, 3), jnp.uint8,
                                       sharding=batch_sharding(mesh))
        lbl_sds = jax.ShapeDtypeStruct((BATCH, S), jnp.int32, sharding=batch_sharding(mesh))
        stats = step.lower(params, mstate, img_sds, lbl_sds).compile().memory_analysis()
        return {
            "temp_gib_per_device": round(stats.temp_size_in_bytes / GIB, 3),
            "argument_gib_per_device": round(stats.argument_size_in_bytes / GIB, 3),
        }

    mesh_xla = create_mesh(MeshConfig(data=8))
    task_xla = MaskedTask(bb, head, tc, mesh=mesh_xla)
    xla = compiled_stats(task_xla, mesh_xla)
    print(f"xla data=8:  {xla}", flush=True)

    mesh_ring = create_mesh(MeshConfig(data=1, seq=8))
    task_ring = MaskedTask(bb, head, tc, attention_impl="ring", mesh=mesh_ring)
    ring = compiled_stats(task_ring, mesh_ring)
    print(f"ring seq=8:  {ring}", flush=True)

    return {
        "config": f"masked ViT fwd+bwd, S={S} frames ({WIDTH}-px packed lines), "
                  f"batch {BATCH}, d512 h4 L2, 8 devices",
        "xla_attention_data8": xla,
        "ring_attention_seq8": ring,
        "v5e_hbm_gib": V5E_HBM_GIB,
        "xla_exceeds_v5e_hbm": xla["temp_gib_per_device"] > V5E_HBM_GIB,
        "ring_fits_v5e_hbm": ring["temp_gib_per_device"] < V5E_HBM_GIB,
    }


def _fsdp_leg():
    import jax

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer

    bb = BackboneConfig(type="vit", model_dim=1536, num_heads=8, num_blocks=8,
                        feedforward_dim=6144, max_len=512)
    head = HeadConfig(in_features=1536, out_features=4096)
    rng = np.random.RandomState(0)
    batch = synthetic_masked_batch(rng, batch_size=8, width=2048, num_labels=4096)
    mesh = create_mesh(MeshConfig(data=8))

    def per_device_gib(state):
        dev0 = jax.devices()[0]
        total = 0
        for leaf in jax.tree_util.tree_leaves((state.params, state.opt_state)):
            if hasattr(leaf, "addressable_shards"):
                total += sum(s.data.nbytes for s in leaf.addressable_shards if s.device == dev0)
        return total / GIB

    out = {}
    for name, fsdp in (("replicated", False), ("fsdp", True)):
        cfg = TrainingConfig(masking_prob=0.15, fsdp=fsdp, seed=0)
        task = MaskedTask(bb, head, cfg, mesh=mesh)
        state = Trainer(task, cfg, mesh=mesh).init_state(batch)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
        out[name] = {"params_plus_moments_gib_per_device": round(per_device_gib(state), 3)}
        out["n_params"] = int(n_params)
        del state, task
    out["config"] = "masked ViT d1536 h8 L8 ff6144 v4096, Adam, data=8 mesh"
    out["reduction_x"] = round(
        out["replicated"]["params_plus_moments_gib_per_device"]
        / max(out["fsdp"]["params_plus_moments_gib_per_device"], 1e-9), 2)
    print(f"fsdp leg: {out}", flush=True)
    return out


def _moments_leg():
    """Optimizer-state bytes for the 234M config under the three moment
    storage modes (--moments-dtype float32/bfloat16/int8). Physical nbytes of
    the real state tree, including the int8 blockwise scales overhead."""
    import jax

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer

    bb = BackboneConfig(type="vit", model_dim=1536, num_heads=8, num_blocks=8,
                        feedforward_dim=6144, max_len=512)
    head = HeadConfig(in_features=1536, out_features=4096)
    rng = np.random.RandomState(0)
    batch = synthetic_masked_batch(rng, batch_size=8, width=2048, num_labels=4096)
    mesh = create_mesh(MeshConfig(data=1), devices=jax.devices()[:1])

    out = {}
    for dtype in ("float32", "bfloat16", "int8"):
        cfg = TrainingConfig(masking_prob=0.15, seed=0, moments_dtype=dtype)
        task = MaskedTask(bb, head, cfg, mesh=mesh)
        state = Trainer(task, cfg, mesh=mesh).init_state(batch)
        opt_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(state.opt_state))
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
        out[dtype] = {"opt_state_gib": round(opt_bytes / GIB, 3),
                      "bytes_per_param": round(opt_bytes / n_params, 2)}
        out["n_params"] = int(n_params)
        del state, task
    out["config"] = "masked ViT d1536 h8 L8 ff6144 v4096 (234M), Adam"
    print(f"moments leg: {out}", flush=True)
    return out


def main():
    report = {"ring": _ring_leg(), "fsdp": _fsdp_leg(), "moments": _moments_leg()}
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "ring_xla_temp_gib": report["ring"]["xla_attention_data8"]["temp_gib_per_device"],
        "ring_ring_temp_gib": report["ring"]["ring_attention_seq8"]["temp_gib_per_device"],
        "fsdp_reduction_x": report["fsdp"]["reduction_x"],
        "moments_int8_bytes_per_param": report["moments"]["int8"]["bytes_per_param"],
    }))


if __name__ == "__main__":
    main()
