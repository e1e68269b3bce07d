"""Phase-2 CLI — replaces evaluation/*.sh + the lmms-eval invocation.

  python -m tspo_tpu.cli.evaluate --task LongVideoBench \
      --frame-idx-json evaluation/jsons_idx/TSPO_LongVideoBench_frameIdx.json \
      --video-root /videos --backbone llava_video --backbone-path /ckpt \
      --max-frames-num 64 --output results/

Baseline (uniform sampling, no TSPO):  add --uniform.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description="TSPO benchmark evaluation")
    p.add_argument("--task", default=None,
                   help="LongVideoBench | MLVU | VideoMME | LVBench | ... "
                        "(eval/tasks.py TASK_REGISTRY; required unless "
                        "--config is given)")
    p.add_argument("--frame-idx-json", default=None)
    p.add_argument("--config", default=None,
                   help="yaml of one run dict or a list of run dicts, each "
                        "mapping CLI flag names to values (reference "
                        "lmms-eval --config, __main__.py:86-108); entries "
                        "override the flags on the command line and runs "
                        "execute sequentially")
    p.add_argument("--video-root", default="")
    p.add_argument("--backbone", default="stub",
                   choices=["stub", "llava_video", "qwen2_5_vl"])
    p.add_argument("--backbone-path", default=None)
    p.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative decoding on the "
                        "llava_video and qwen2_5_vl backbones (exact greedy, "
                        "fewer weight passes; "
                        "models/qwen2.greedy_decode_speculative)")
    p.add_argument("--quantize-backbone", action="store_true",
                   help="weight-only int8 decoder (bandwidth-bound decode)")
    p.add_argument("--max-frames-num", type=int, default=64)
    p.add_argument("--batch", type=int, default=1,
                   help="co-decode B consecutive questions through the "
                        "backbone's ragged generate_batch_multi (single-row "
                        "decode is weight-read bound; batching amortizes "
                        "the weight stream — docs/KERNELS.md phase-2)")
    p.add_argument("--uniform", action="store_true",
                   help="uniform-sampling baseline (is_uniform=True)")
    p.add_argument("--live-model-path", default=None,
                   help="TSPO scorer for single-phase live frame selection "
                        "(docs without frame_idx)")
    p.add_argument("--live-method", default="topk",
                   choices=["topk", "bin-max", "aks"])
    p.add_argument("--subtitle-root", default=None,
                   help="directory of .srt (VideoMME-subtitles) or per-doc "
                        "subtitle jsons (LongVideoBench-interleaved)")
    p.add_argument("--pre-prompt", default=None,
                   help="override the task's lmms_eval_specific_kwargs "
                        "pre_prompt (yaml default otherwise)")
    p.add_argument("--post-prompt", default=None,
                   help="override the task's lmms_eval_specific_kwargs "
                        "post_prompt (yaml default otherwise)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port "
                        "(multi-host runs)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    p.add_argument("--output", default="eval_results")
    p.add_argument("--log-samples", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-log-samples writes metrics only (smaller "
                        "output, lighter multi-host gather)")
    p.add_argument("--judge", default=None,
                   help="LLM-judge provider for judged tasks like "
                        "ActivityNet-QA: openai|azure|local|dummy "
                        "(eval/llm_judge.py; $API_TYPE default)")
    p.add_argument("--conv-template", default=None,
                   help="conversation template for the llava_video backbone "
                        "(qwen_1_5 default; vicuna_v1/chatml_direct/... — "
                        "models/conversation.py)")
    p.add_argument("--plm-stc-metadata", default=None,
                   help="PLM-VideoBench STC masklet metadata_test.jsonl "
                        "(bbox overlays for PLM-rcap/rdcap/rtloc)")
    p.add_argument("--megabench-submission", default=None,
                   help="MEGABench-*: also dump the reference-submission-"
                        "format json here (cross-checkable through the "
                        "reference's own offline evaluator)")
    p.add_argument("--wandb-args", default=None,
                   help="comma-separated wandb.init kwargs, e.g. "
                        "'project=tspo,name=run1' (reference --wandb_args); "
                        "without the wandb package, events go to "
                        "<output>/wandb_offline.jsonl")
    return p


# judged-task families: task-name prefixes -> (eval module, registrar).
# Declarative so the prefix list and the dispatch can never drift apart.
JUDGED_TASK_REGISTRARS = (
    (("ActivityNet-QA",), "tasks_activitynet", "register_activitynetqa"),
    (("VideoChatGPT",), "videochatgpt", "register_videochatgpt"),
    (("MovieChat", "VideoDetailDescription"), "more_judged_tasks",
     "register_more_judged"),
    (("VideoEvalPro",), "extra_tasks", "register_extra_tasks"),
    (("TempCompass",), "tempcompass", "register_tempcompass"),
    (("TOMATO",), "tomato_vinoground", "register_tomato_vinoground"),
    (("WorldQA", "CVRR"), "worldqa_cvrr", "register_worldqa_cvrr"),
    (("VDC",), "vdc", "register_vdc"),
    (("EgoThink",), "egothink", "register_egothink"),
    (("VITATECS",), "vitatecs", "register_vitatecs"),
    (("MixEvals",), "mix_evals", "register_mix_evals"),
    (("MMVU",), "mmvu", "register_mmvu"),
    (("PLM-",), "plm_videobench", "register_plm_videobench"),
    (("FunQA",), "funqa", "register_funqa"),
    (("CAPability",), "capability", "register_capability"),
    (("MEGABench",), "megabench", "register_megabench"),
)
# these families have a judge-free rule-based registration from import time;
# without --judge they run as-is (reference defaults: tomato
# USE_GPT_PARSER=False, tempcompass rule-first).  PLM-fgqa/PLM-rtloc are
# rule-scored but live in a judged family — re-registering them with a judge
# is harmless (their process fns never call it)
_RULE_ONLY_WITHOUT_JUDGE = ("TempCompass", "TOMATO", "VITATECS",
                            "PLM-fgqa", "PLM-rtloc", "MEGABench-core")


def _register_judged_task(args, backbone) -> None:
    import importlib
    for prefixes, mod_name, fn_name in JUDGED_TASK_REGISTRARS:
        if not args.task.startswith(prefixes):
            continue
        # non-judge kwargs a registrar family needs (PLM STC bbox overlays)
        extra = {}
        if fn_name == "register_plm_videobench" and \
                getattr(args, "plm_stc_metadata", None):
            extra["stc_metadata"] = args.plm_stc_metadata
        if fn_name == "register_megabench" and \
                getattr(args, "megabench_submission", None):
            extra["submission_path"] = args.megabench_submission
        if args.judge is None and args.task.startswith(
                _RULE_ONLY_WITHOUT_JUDGE):
            # re-register the rule-only defaults explicitly: a prior
            # --config run may have installed a judged variant in the
            # shared registry
            mod = importlib.import_module(f"tspo_tpu.eval.{mod_name}")
            getattr(mod, fn_name)(None, **extra)
            return
        from ..eval.llm_judge import create_provider
        if args.judge:
            # "local" grades with the SAME loaded backbone (zero egress)
            kw = {"backbone": backbone} if args.judge == "local" else {}
            judge = create_provider(args.judge, **kw)
        else:
            print(f"[warn] {args.task} is LLM-judged but no --judge was "
                  "given: defaulting to the $API_TYPE/$OPENAI_API_KEY "
                  "env-configured provider")
            judge = create_provider()
        mod = importlib.import_module(f"tspo_tpu.eval.{mod_name}")
        getattr(mod, fn_name)(judge, **extra)
        return


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.config:
        # namespace-copy override like the reference (__main__.py:322-371):
        # handles =-form flags, false booleans, and nulls for free, and one
        # failing run logs + continues instead of killing the sweep
        import copy
        import yaml
        with open(args.config) as f:
            runs = yaml.safe_load(f)
        runs = runs if isinstance(runs, list) else [runs]
        for i, run in enumerate(runs):
            run_args = copy.copy(args)
            run_args.config = None
            for key, value in (run or {}).items():
                setattr(run_args, str(key).replace("-", "_"), value)
            print(f"[config] run {i + 1}/{len(runs)}: task={run_args.task}")
            try:
                _run(run_args)
            # SystemExit too: a misconfigured run reaches parser.error()
            # (exit 2), which is a BaseException and would otherwise kill
            # the remaining sweep entries
            except (Exception, SystemExit) as e:  # noqa: BLE001 — sweep keeps going
                import traceback
                traceback.print_exc()
                print(f"[config] run {i + 1} failed: {e}")
        return
    _run(args)


def _run(args):
    if not args.task or not args.frame_idx_json:
        build_parser().error(
            "--task and --frame-idx-json are required (or pass --config)")
    from .common import enable_compilation_cache
    enable_compilation_cache()
    if args.coordinator:
        from ..parallel.multihost import initialize
        initialize(args.coordinator, args.num_processes, args.process_id)
    from ..eval.datasets import load_json
    from ..eval.harness import evaluate_task
    from .common import load_backbone

    docs = load_json(args.frame_idx_json)
    if args.world == 1:
        from ..parallel.multihost import process_shard
        args.rank, args.world = process_shard()
    # max_frames_num feeds the vicuna/yi rope-scaling override (factor is
    # derived from the frame budget — llava_vid_tspo.py:159-174)
    backbone = load_backbone(args.backbone, args.backbone_path,
                             conv_template=args.conv_template,
                             speculative=args.speculative,
                             max_frames_num=args.max_frames_num)
    _register_judged_task(args, backbone)
    scorer = None
    if args.live_model_path:
        from .common import load_scorer
        scorer = load_scorer(args.live_model_path)
    if args.quantize_backbone and hasattr(backbone, "quantize_lm"):
        backbone.quantize_lm()
    t0 = time.time()
    done = []
    res = evaluate_task(
        args.task, docs, backbone, video_root=args.video_root,
        max_frames_num=args.max_frames_num, is_uniform=args.uniform,
        limit=args.limit, shard=(args.rank, args.world),
        log_samples=args.log_samples, scorer=scorer,
        live_method=args.live_method, batch_size=args.batch,
        specific_kwargs={k: v for k, v in
                         (("pre_prompt", args.pre_prompt),
                          ("post_prompt", args.post_prompt),
                          ("subtitle_root", args.subtitle_root),
                          ("video_root",
                           args.video_root if args.subtitle_root else None),
                          ("frame_num",
                           args.max_frames_num if args.subtitle_root else None))
                         if v is not None}
        or None,
        progress=lambda qid: done.append(qid) or (
            len(done) % 25 == 0 and print(f"{len(done)} done")))

    # multi-host: gather per-rank results to host 0 and aggregate globally
    try:
        from ..parallel.multihost import gather_host_objects
        from ..eval.harness import EvalResult, merge_shards
        gathered = gather_host_objects(
            {"results": res.results, "samples": res.samples})
        if gathered is None:
            return  # non-zero host: host 0 writes the merged output
        if len(gathered) > 1:
            res = merge_shards(args.task, [
                EvalResult(results=g["results"], metrics={},
                           samples=g["samples"]) for g in gathered])
    except Exception as e:
        # in a genuinely distributed run a failed merge means the output
        # would silently be one rank's shard-local metrics — fail loudly
        import jax
        import traceback
        if jax.process_count() > 1:
            raise
        print(f"[warn] single-host result merge skipped: {e}")
        traceback.print_exc()

    os.makedirs(args.output, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    agg_path = os.path.join(args.output,
                            f"{args.task}_rank{args.rank}_{stamp}.json")
    with open(agg_path, "w") as f:
        json.dump({"task": args.task, "metrics": res.metrics,
                   "n": len(res.results),
                   "elapsed_s": round(time.time() - t0, 1),
                   "config": vars(args)}, f, indent=2)
    if args.log_samples:
        with open(agg_path.replace(".json", "_samples.jsonl"), "w") as f:
            for s in res.samples:
                f.write(json.dumps(s) + "\n")
    if args.wandb_args is not None:
        from ..utils.wandb_logger import WandbLogger, parse_wandb_args
        wb = WandbLogger(output_dir=args.output,
                         log_samples=args.log_samples,
                         **parse_wandb_args(args.wandb_args))
        wb.post_init({args.task: res.metrics})
        wb.log_eval_result()
        wb.log_eval_samples({args.task: res.samples})
        wb.finish()
    print(make_table(args.task, res.metrics, len(res.results)))
    print(f"saved -> {agg_path}")


def make_table(task: str, metrics: dict, n: int) -> str:
    """Results table (lmms_eval.utils.make_table equivalent)."""
    def fmt(v):
        # non-numeric values are informational (e.g. FunQA's "bleurt:
        # gated ..." runbook note) — print verbatim
        return f"{v:.2f}" if isinstance(v, (int, float)) else str(v)

    lines = [f"| {task} (n={n}) | acc % |", "|---|---|"]
    for key, val in metrics.items():
        if isinstance(val, dict):
            for sub, v in val.items():
                lines.append(f"| {key}/{sub} | {fmt(v)} |")
        else:
            lines.append(f"| {key} | {fmt(val)} |")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
