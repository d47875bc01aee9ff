"""Text-analysis kernels for training-data pipelines: token counting,
quality scoring, language-ID, char-level rolling-hash fingerprints.

These extend the reference's capability surface (it only hashes bytes) with
the operations a web-scale training-data pipeline needs; each is exposed as
a ``queries()`` entry over the ``documents`` table (task brief; SURVEY.md
§2.8). All kernels are per-batch vectorized or cheap per-row string ops on
pre-compiled regexes; stateful setup (stopword tables, regexes) lives in the
stage actor's ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np

from .hashing import splitmix64

TOKEN_RE = re.compile(r"[a-z0-9]+")
PUNCT_RE = re.compile(r"[^\w\s]")
WS_RE = re.compile(r"\s")

# Tiny per-language stopword lists (top function words). Deterministic,
# self-contained heuristic — NOT a model; documented approximation.
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to a in is it you that he was for on are with as i his they be at one have this".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist im dem nicht ein eine als auch es an".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al lo como mas pero sus le".split()),
    "zh": frozenset(),  # token heuristic does not apply to CJK (documented)
}


def token_count(text: str) -> int:
    """Whitespace+alnum token count under the canonical tokenizer."""
    return len(TOKEN_RE.findall(text.lower()))


def quality_features(text: str) -> tuple[int, int, int, int, float]:
    """(n_chars, n_tokens, n_punct, n_ws, mean_token_len) for quality scoring."""
    toks = TOKEN_RE.findall(text.lower())
    n_tok = len(toks)
    mean_len = sum(len(t) for t in toks) / n_tok if n_tok else 0.0
    return (
        len(text),
        n_tok,
        len(PUNCT_RE.findall(text)),
        len(WS_RE.findall(text)),
        mean_len,
    )


def quality_score(n_chars: int, n_tokens: int, n_punct: int, mean_token_len: float) -> float:
    """Deterministic [0,1] quality heuristic: favors mid-length docs with
    moderate punctuation and plausible word lengths (length/punct/word-shape
    ratios — the task brief's quality-scoring op)."""
    if n_tokens == 0 or n_chars == 0:
        return 0.0
    length_term = min(1.0, n_tokens / 100.0)
    punct_ratio = n_punct / n_chars
    punct_term = max(0.0, 1.0 - 4.0 * punct_ratio)
    shape_term = 1.0 if 2.5 <= mean_token_len <= 9.0 else 0.5
    return round(length_term * punct_term * shape_term, 6)


def langid_scores(tokens: list[str]) -> dict[str, float]:
    """Stopword-hit fraction per language (n-gram/stopword heuristic)."""
    if not tokens:
        return {lang: 0.0 for lang in STOPWORDS}
    n = len(tokens)
    return {
        lang: sum(1 for t in tokens if t in sw) / n for lang, sw in STOPWORDS.items()
    }


def predict_lang(text: str, default: str = "und") -> str:
    """argmax langid heuristic; 'und' when nothing scores."""
    toks = TOKEN_RE.findall(text.lower())
    scores = langid_scores(toks)
    best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    return best[0] if best[1] > 0.0 else default


# ---------------------------------------------------------------------------
# Char-level rolling-hash fingerprints with winnowing (Schleimer et al.,
# SIGMOD 2003 "local algorithms for document fingerprinting" — the MOSS
# scheme). Guarantee: two docs sharing a substring of >= guarantee_len chars
# share at least one selected fingerprint. Drives the optional suffix/exact-
# substring pass (D5) without building suffix arrays.
# ---------------------------------------------------------------------------

_B = np.uint64(0x100000001B3)  # FNV-ish odd base for the rolling polynomial


def rolling_window_hashes(text: str, w: int) -> np.ndarray:
    """uint64 polynomial hash of every w-char window (vectorized)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n < w:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # prefix polynomial trick: H[i] = sum data[i+j] * B^(w-1-j)
        powers = np.empty(w, dtype=np.uint64)
        powers[w - 1] = np.uint64(1)
        for j in range(w - 2, -1, -1):
            powers[j] = powers[j + 1] * _B
        windows = np.lib.stride_tricks.sliding_window_view(data, w)
        h = (windows.astype(np.uint64) * powers[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return splitmix64(h)


def winnow(hashes: np.ndarray, window: int) -> np.ndarray:
    """Winnowing selection: min hash of every ``window`` consecutive hashes
    (rightmost min on ties), deduplicated. Returns selected hash values."""
    n = len(hashes)
    if n == 0:
        return hashes
    if n <= window:
        return np.unique(hashes.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(sw.min(axis=1))


def fingerprint_doc(text: str, *, w: int = 25, guarantee_len: int = 50) -> np.ndarray:
    """Selected winnowed fingerprints; docs sharing a substring of
    >= guarantee_len chars share >= 1 fingerprint."""
    window = guarantee_len - w + 1
    return winnow(rolling_window_hashes(text, w), window)
