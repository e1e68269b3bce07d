"""Selection ops vs the ACTUAL reference functions (model/utils.py).

test_ops.py proves our selection math against independent numpy oracles;
this file closes the loop by importing the reference's own AKS_sampling /
uniform_sampling / generate_uniform_integers (torch+scipy are in the image)
and fuzzing index-exact parity over randomized score landscapes — AKS
decides which frames reach the backbone, i.e. the judged frame-index
fidelity criterion (SURVEY §7.3 item 4).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tspo_tpu.ops.selection import (aks_select, generate_uniform_integers,
                                    uniform_sample_indices)

REF_UTILS = "/root/reference/model/utils.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_UTILS):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_model_utils", REF_UTILS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_model_utils"] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop("ref_model_utils", None)
    return mod


def _score_landscapes(rng, T):
    """Score vectors shaped like real CLIP cosine tracks: noise, smooth
    drift, one bump, several bumps (each exercises different split depths)."""
    t = np.arange(T, dtype=np.float32)
    yield rng.normal(0.25, 0.02, T).astype(np.float32)
    yield (0.2 + 0.05 * np.sin(t / 17.0) + rng.normal(0, 0.01, T)).astype(np.float32)
    bump = np.exp(-((t - rng.integers(0, T)) ** 2) / (2 * (T / 20 + 1) ** 2))
    yield (0.2 + 0.15 * bump + rng.normal(0, 0.01, T)).astype(np.float32)
    multi = sum(np.exp(-((t - rng.integers(0, T)) ** 2) / (2 * 9.0))
                for _ in range(4))
    yield (0.2 + 0.1 * multi + rng.normal(0, 0.005, T)).astype(np.float32)


@pytest.mark.parametrize("T", [10, 63, 64, 65, 200, 777])
@pytest.mark.parametrize("num", [16, 64])
def test_aks_matches_reference(ref, T, num, capsys):
    rng = np.random.default_rng(T * 1000 + num)
    for scores in _score_landscapes(rng, T):
        ours = aks_select(scores, num)
        theirs = ref.AKS_sampling(scores.copy(), num)
        assert list(ours) == list(theirs), (T, num)


def test_aks_videomme_profile_matches_reference(ref, monkeypatch):
    """The VideoMME thresholds (t1=0.8, depth=5, utils.py:131-133) drive the
    reference by patching its hardcoded constants the way a user would edit
    them; ours takes them as arguments."""
    import ast
    src = open(REF_UTILS).read()
    src = src.replace("t1 = 0.2", "t1 = 0.8").replace(
        "all_depth = 3", "all_depth = 5")
    ns = {}
    tree = ast.parse(src)
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("meanstd", "AKS_sampling")]
    import heapq
    ns = {"np": np, "heapq": heapq, "print": lambda *a, **k: None}
    exec(compile(ast.Module(keep, []), REF_UTILS, "exec"), ns)
    rng = np.random.default_rng(7)
    for scores in _score_landscapes(rng, 300):
        ours = aks_select(scores, 64, t1=0.8, all_depth=5)
        theirs = ns["AKS_sampling"](scores.copy(), 64)
        assert list(ours) == list(theirs)


def test_uniform_sampling_matches_reference(ref):
    for n in [1, 2, 5, 16, 63, 64, 100, 321]:
        lst = list(range(n))
        for num in [0, 1, 2, 7, 16, 63, 64, 65, n]:
            ours = uniform_sample_indices(n, num)
            theirs = ref.uniform_sampling(lst, num)
            assert ours == theirs, (n, num)


def test_generate_uniform_integers_matches_reference(ref):
    for t in [0, 1, 7, 59, 128, 1023]:
        for l in [0, 1, 2, 3, 16, 64]:
            assert generate_uniform_integers(t, l) == \
                ref.generate_uniform_integers(t, l), (t, l)


@pytest.fixture(scope="module")
def ref_inference_ts(ref):
    """The reference ``TSPOModel.inference_ts`` method body (temporal_agent
    .py:185-212) extracted standalone — it touches no model state, only
    torch + the two utils helpers, so it runs without building a CLIP."""
    import ast
    path = "/root/reference/model/temporal_agent.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(path).read())
    fn = None
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and \
                        item.name == "inference_ts":
                    fn = item
    assert fn is not None
    ns = {"torch": torch,
          "generate_uniform_integers": ref.generate_uniform_integers,
          "group_features_by_cluster": ref.group_features_by_cluster,
          "AKS_sampling": ref.AKS_sampling,
          "print": lambda *a, **k: None}
    exec(compile(ast.Module([fn], []), path, "exec"), ns)
    return lambda conf, method, k: ns["inference_ts"](None, conf, method, k)


@pytest.mark.parametrize("T", [64, 65, 100, 333, 1000])
@pytest.mark.parametrize("k", [16, 64])
def test_topk_and_binmax_match_reference(ref_inference_ts, T, k):
    import jax.numpy as jnp
    from tspo_tpu.ops.selection import bin_max_select, topk_select
    rng = np.random.default_rng(T * 31 + k)
    for scores in _score_landscapes(rng, T):
        conf = torch.from_numpy(scores.copy())
        ref_topk = ref_inference_ts(conf, "topk", k)[0].numpy()
        ours_topk = np.asarray(topk_select(jnp.asarray(scores), min(T, k))[0])
        assert list(ours_topk[: len(ref_topk)]) == list(ref_topk), ("topk", T, k)
        if T >= k:
            ref_bm = ref_inference_ts(conf, "bin-max", k)[0].numpy()
            ours_bm = np.asarray(bin_max_select(jnp.asarray(scores), k)[0])
            assert list(ours_bm) == list(ref_bm), ("bin-max", T, k)
