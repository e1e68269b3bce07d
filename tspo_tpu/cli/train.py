"""Training CLI — replaces train_deepspeed.sh / toy_example.sh + tspo.py main.

  python -m tspo_tpu.cli.train --jsonl-path data.jsonl --video-folder /videos \
      --clip-path /ckpt/clip --backbone llava_video --backbone-path /ckpt/llava \
      --num-generations 8 --training-sample-len 16 --window-size 12

Toy example (single chip, stub-friendly):
  python -m tspo_tpu.cli.train --toy-jsonl-path toy.jsonl --video-folder . \
      --backbone stub --max-steps 20
"""

from __future__ import annotations

import argparse



def build_parser():
    p = argparse.ArgumentParser(description="TSPO GRPO training on TPU")
    p.add_argument("--jsonl-path", default=None)
    p.add_argument("--toy-jsonl-path", default=None)
    p.add_argument("--video-folder", required=True)
    p.add_argument("--clip-path", default=None,
                   help="merged TSPO/CLIP checkpoint dir (random init if absent)")
    p.add_argument("--backbone", default="stub",
                   choices=["stub", "llava_video", "qwen2_5_vl"])
    p.add_argument("--backbone-path", default=None)
    p.add_argument("--quantize-backbone", action="store_true",
                   help="weight-only int8 decoder (bandwidth-bound decode)")
    p.add_argument("--output-dir", default="output")
    p.add_argument("--reward-funcs", nargs="+", default=["accuracy", "temporal"])
    p.add_argument("--num-generations", type=int, default=8)
    p.add_argument("--training-sample-len", type=int, default=16)
    p.add_argument("--window-size", type=int, default=12)
    p.add_argument("--score-tau", type=float, default=0.025)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--num-train-epochs", type=float, default=None,
                   help="plan the run (and the tau anneal horizon) as "
                        "epochs x dataset length like the reference "
                        "--num_train_epochs; --max-steps then only caps it")
    p.add_argument("--cross-batch-rollouts", action="store_true",
                   help="batch ALL B x G rollouts of a batched step into "
                        "one ragged-prompt decode (generate_batch_multi)")
    p.add_argument("--save-steps", type=int, default=100)
    p.add_argument("--save-total-limit", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CPU smoke runs)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="samples per step on THIS process; 0 = single-sample "
                        "loop (reference per-rank bs=1).  >0 uses the batched "
                        "data-parallel step")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="single-process data-parallel mesh size over local "
                        "devices (0 = no mesh)")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator host:port — multi-host "
                        "DP training (the train_deepspeed.sh --hostfile "
                        "equivalent)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--export-merged", default=None,
                   help="directory for the merged TSPO-0.4B export after training")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --output-dir")
    p.add_argument("--ckpt-backend", default="npz", choices=("npz", "orbax"),
                   help="orbax = async multi-host checkpointing with native "
                        "sharded-array support (train/checkpoint.py)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also emit TensorBoard event files to "
                        "<output-dir>/tb (utils/tensorboard.py, TF-free)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    if args.coordinator:
        from ..parallel.multihost import initialize
        initialize(args.coordinator, args.num_processes, args.process_id)
    from ..configs import TrainConfig
    from ..train.trainer import TSPOTrainer
    from .common import load_backbone, load_jsonl, load_scorer

    jsonl = args.toy_jsonl_path or args.jsonl_path
    if not jsonl:
        raise SystemExit("need --jsonl-path or --toy-jsonl-path")
    dataset = load_jsonl(jsonl)

    cfg = TrainConfig(
        num_generations=args.num_generations,
        training_sample_len=args.training_sample_len,
        window_size=args.window_size, score_tau=args.score_tau,
        learning_rate=args.learning_rate, max_steps=args.max_steps,
        save_every=args.save_steps, save_total_limit=args.save_total_limit,
        ckpt_backend=args.ckpt_backend, seed=args.seed,
        num_train_epochs=args.num_train_epochs,
        cross_batch_rollouts=args.cross_batch_rollouts)

    scorer = load_scorer(args.clip_path, seed=args.seed, tiny=args.tiny)
    backbone = load_backbone(args.backbone, args.backbone_path)
    if args.quantize_backbone and hasattr(backbone, "quantize_lm"):
        backbone.quantize_lm()
    trainer = TSPOTrainer(
        scorer=scorer, backbone=backbone, dataset=dataset, cfg=cfg,
        video_folder=args.video_folder, irrelevant_pool=dataset,
        reward_funcs=tuple(args.reward_funcs), output_dir=args.output_dir,
        toy_example=bool(args.toy_jsonl_path))
    if args.resume:
        step = trainer.resume_from()
        print(f"resumed from step {step}")
    if args.batch_size > 0:
        history = _train_batched(trainer, args)
    else:
        history = trainer.train(
            max_steps=None if args.num_train_epochs else args.max_steps)
    if args.tensorboard and _is_rank0():
        import os
        from ..utils.tensorboard import metrics_jsonl_to_tensorboard
        tb_path = metrics_jsonl_to_tensorboard(
            trainer.metrics_path, os.path.join(args.output_dir, "tb"))
        print(f"tensorboard events -> {tb_path}")
    if args.export_merged and _is_rank0():
        trainer.export_merged(args.export_merged)
    print(f"trained {len(history)} steps; "
          f"final reward {history[-1]['reward']:.3f}" if history else "no steps")


def _is_rank0() -> bool:
    import jax
    return jax.process_index() == 0


def _train_batched(trainer, args) -> list:
    """Batched / data-parallel training loop (train_deepspeed.sh layout: B
    samples per step, gradient mean across the mesh 'data' axis).  Multi-host
    when --coordinator is set; single-host mesh when --mesh-data > 1."""
    import json as _json
    import os

    import jax
    import numpy as np

    distributed = jax.process_count() > 1
    mesh = None
    if distributed:
        from ..parallel.mesh import create_mesh
        mesh = create_mesh(data=len(jax.devices()), model=1)
    elif args.mesh_data > 1:
        from ..parallel.mesh import create_mesh
        trainer.mesh = create_mesh(data=args.mesh_data, model=1,
                                   devices=jax.devices()[:args.mesh_data])

    rng = np.random.default_rng(trainer.cfg.seed)
    order = rng.permutation(len(trainer.dataset))  # same order on every rank
    rank, world = jax.process_index(), jax.process_count()
    os.makedirs(trainer.output_dir, exist_ok=True)
    history = []
    B = args.batch_size
    stride = B * world
    # orbax save/wait are cross-process collectives: EVERY process must
    # enter them or rank 0 deadlocks in the sync barrier; npz writes are
    # single-file and stay rank-0-only.
    save_all_ranks = trainer.cfg.ckpt_backend == "orbax"
    # honor --num-train-epochs like the unbatched path (reference HF
    # Trainer semantics: epochs set the run length, --max-steps only caps
    # it); one batched step consumes B x world samples
    if trainer.cfg.num_train_epochs:
        steps_per_epoch = -(-len(order) // stride)
        n_steps = int(np.ceil(trainer.cfg.num_train_epochs * steps_per_epoch))
        if args.max_steps:
            n_steps = min(n_steps, args.max_steps)
    else:
        n_steps = args.max_steps
    # pin the tau anneal horizon to THIS loop's length (resume-aware) —
    # otherwise _tau() derives it from min(max_steps, len(dataset)) and a
    # run longer than the dataset plateaus early / would overshoot the
    # schedule (anneal_tau also clamps as a backstop)
    trainer.total_steps = trainer.step + n_steps
    for step in range(n_steps):
        base = (step * stride) % len(order)
        picks = [int(order[(base + rank * B + j) % len(order)])
                 for j in range(B)]
        rows = [trainer.dataset[i] for i in picks]
        if distributed:
            metrics = trainer.train_step_batch_global(rows, mesh)
        else:
            metrics = trainer.train_step_batch(rows)
        history.append(metrics)
        if _is_rank0():
            with open(trainer.metrics_path, "a") as f:
                f.write(_json.dumps(metrics) + "\n")
        trainer.step += 1
        if trainer.step % trainer.cfg.save_every == 0 and \
                (save_all_ranks or _is_rank0()):
            trainer.save_checkpoint()
    if save_all_ranks or _is_rank0():
        trainer.save_checkpoint()
    return history


if __name__ == "__main__":
    main()
