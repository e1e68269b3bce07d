"""Pure-Python caption metrics: coco-style BLEU-4 and ROUGE-L.

The reference FunQA task scores BLEU-4 and ROUGE-L through pycocoevalcap
(funqa/utils.py:132-165), whose scorers wrap the original coco-caption code
and whose PTBTokenizer shells out to the Stanford CoreNLP **Java** jar.
Neither pycocoevalcap nor a JVM ships in this environment, so this module
reimplements the two scoring algorithms exactly as coco-caption defines them:

  - BLEU: bleu_scorer.py's per-n cumulative geometric precision with the
    tiny/small epsilons (tiny=1e-15, small=1e-9) and the exp(1 - 1/ratio)
    brevity penalty for ratio < 1 ("closest" reflen — identity for the
    single-reference pairs FunQA scores);
  - ROUGE-L: rouge.py's LCS F-score with beta=1.2.

The tokenizer is the one deliberate approximation: ``ptb_tokenize`` applies
the same normalization PTBTokenizer is configured with
(``-preserveLines -lowerCase`` + dropping the PUNCTUATIONS list) using a
regex splitter instead of the CoreNLP finite-state tokenizer.  For the plain
English captions these tasks compare, outputs match on everything but exotic
constructions (unicode quotes, abbreviations with internal periods).
"""

from __future__ import annotations

import math
import re
from collections import Counter

# pycocoevalcap/tokenizer/ptbtokenizer.py PUNCTUATIONS
PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]

_TOKEN_RE = re.compile(r"[^\s]+")
_SPLIT_PUNCT_RE = re.compile(r"([.,!?;:]+)|(\.\.\.)|(--)")


def ptb_tokenize(text: str) -> list:
    """Lowercase, split words from trailing/leading punctuation, drop
    punctuation tokens (PTBTokenizer approximation, see module doc)."""
    text = text.lower().strip()
    # separate punctuation runs from words so they become droppable tokens
    text = re.sub(r"([a-z0-9])([.,!?;:]+)(\s|$)", r"\1 \2 ", text)
    text = re.sub(r"(\s|^)([.,!?;:]+)([a-z0-9])", r" \2 \3", text)
    toks = _TOKEN_RE.findall(text)
    return [t for t in toks if t not in PUNCTUATIONS]


def _ngram_counts(tokens: list, n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu4(reference: str, hypothesis: str, n: int = 4,
          tokenizer=ptb_tokenize) -> float:
    """Single-pair BLEU-n, coco bleu_scorer.py semantics (compute_score with
    option="closest" degenerates to the single reference's length)."""
    ref, hyp = tokenizer(reference), tokenizer(hypothesis)
    tiny, small = 1e-15, 1e-9
    bleu = 1.0
    for m in range(1, n + 1):
        ref_counts = _ngram_counts(ref, m)
        hyp_counts = _ngram_counts(hyp, m)
        correct = sum(min(c, ref_counts[g]) for g, c in hyp_counts.items())
        guess = max(len(hyp) - m + 1, 0)
        bleu *= (correct + tiny) / (guess + small)
    score = bleu ** (1.0 / n)
    ratio = (len(hyp) + tiny) / (len(ref) + small)
    if ratio < 1:
        score *= math.exp(1 - 1 / ratio)
    return score


def _lcs_len(a: list, b: list) -> int:
    """Classic O(len(a)*len(b)) LCS table (rouge.py::my_lcs)."""
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l(reference: str, hypothesis: str, beta: float = 1.2,
            tokenizer=ptb_tokenize) -> float:
    """ROUGE-L F-beta (coco rouge.py::calc_score, beta=1.2)."""
    ref, hyp = tokenizer(reference), tokenizer(hypothesis)
    if not ref or not hyp:
        return 0.0
    lcs = _lcs_len(hyp, ref)
    prec = lcs / len(hyp)
    rec = lcs / len(ref)
    if prec == 0 or rec == 0:
        return 0.0
    return ((1 + beta ** 2) * prec * rec) / (rec + beta ** 2 * prec)
