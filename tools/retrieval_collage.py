"""Render the joint-embedding retrieval collage from a TRAINED checkpoint.

The reference's qualitative story for VICReg/NT-Xent is the nearest-neighbour
retrieval collage (joint_embedding_pretraining/visualizer.py:63-121: query
frame per line, top-k most-similar frames across the other view — with its
`largest=False` retrieval bug fixed here). This tool reproduces that artifact
from a rendered-experiment checkpoint trained on the real TPU:

    python tools/retrieval_collage.py --objective vicreg \
        --corpus docs/demo/rendered_corpus --out docs/demo/vicreg_retrieval.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools.rendered_experiment import BACKBONE, WIDTH  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--objective", default="vicreg", choices=("vicreg", "ntxent"))
    p.add_argument("--corpus", default="docs/demo/rendered_corpus")
    p.add_argument("--out", default=None, help="output PNG (default docs/demo/<objective>_retrieval.png)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--top-k", type=int, default=5)
    args = p.parse_args()

    import jax

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
    from pero_pretraining_tpu.data.augment import build_augmentations
    from pero_pretraining_tpu.data.batching import BatchCreator
    from pero_pretraining_tpu.data.dataset import LinesDataset
    from pero_pretraining_tpu.data.loader import DataLoader
    from pero_pretraining_tpu.pipelines.joint import JointEmbeddingTask
    from pero_pretraining_tpu.pipelines.visualizers import JointEmbeddingVisualizer
    from pero_pretraining_tpu.training.checkpoint import load_checkpoint
    from pero_pretraining_tpu.training.state import TrainState
    from pero_pretraining_tpu.training.trainer import Trainer
    from pero_pretraining_tpu.utils.visualizer import write_png

    ckpt = os.path.join(args.corpus, f"pretrained_{args.objective}.msgpack")
    out = args.out or os.path.join("docs", "demo", f"{args.objective}_retrieval.png")

    backbone_cfg = BackboneConfig(**BACKBONE)
    head_cfg = HeadConfig(type="mlp", in_features=BACKBONE["model_dim"], out_features=1024,
                          hidden_dim=1024, num_layers=3)
    training = TrainingConfig(learning_rate=3e-4, batch_size=16, seed=args.seed)
    task = JointEmbeddingTask(backbone_cfg, head_cfg, training, loss_type=args.objective)

    ds = LinesDataset(os.path.join(args.corpus, "images.sqlite"), os.path.join(args.corpus, "tst.lines"),
                      max_width=WIDTH, pair_images=True, augmentations=build_augmentations("light"))
    loader = DataLoader(ds, BatchCreator(pad_to=WIDTH, seed=args.seed), batch_size=16,
                        shuffle=False, num_workers=4)

    # template state with the same structure the pretrain stage saved
    # (plain-Adam opt_state; load_checkpoint restores into the template)
    trainer = Trainer(task, training)
    variables = dict(task.init_variables(jax.random.PRNGKey(args.seed), next(iter(loader))))
    params = jax.device_put(variables.pop("params"))
    opt_state = jax.jit(trainer.tx.init)(params)
    state = TrainState.create(params, jax.device_put(variables), opt_state, args.seed)
    state = load_checkpoint(state, ckpt)

    vis = JointEmbeddingVisualizer(task, loader, top_k=args.top_k)
    img = vis.visualize(state)
    write_png(out, img)
    print(f"retrieval collage ({args.objective}, ckpt {ckpt}) -> {out}  {img.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
