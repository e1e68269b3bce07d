"""Plot training reward curves from metrics.jsonl — the
scripts/read_tensorboard.py equivalent (C11).

  python -m tspo_tpu.cli.plot_metrics --metrics output/metrics.jsonl \
      --out rewards.png
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--metrics", required=True)
    p.add_argument("--out", default="rewards.png")
    p.add_argument("--keys", nargs="+",
                   default=["rewards/accuracy_reward", "rewards/temporal_reward"])
    p.add_argument("--alpha", type=float, default=0.9, help="EMA smoothing")
    args = p.parse_args(argv)
    from ..utils.metrics import plot_rewards
    out = plot_rewards(args.metrics, args.out, keys=tuple(args.keys),
                       alpha=args.alpha)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
