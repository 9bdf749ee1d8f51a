"""Text analysis for training-data pipelines: lang-ID, quality, fingerprints.

These are the web-payload analogs of the reference's per-pixel quality
masks: NDWI water masking (``seagrass_lib.py:334-343``) becomes quality
scoring; the condition-DSL counting (``count_raster_values.py``) becomes
stopword/punctuation ratio thresholds; XML metadata parsing
(``seagrass_lib.py:174-193``) becomes per-row field extraction.

All stages are ``map_batches`` callables; the classifier is an actor-pool
class (profiles + compiled regexes built once per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Tiny character-frequency profiles for an n-gram-free heuristic lang-ID.
# Public-knowledge letter statistics; deliberately simple + deterministic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "die", "ist", "nicht", "das", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "que"),
    "es": ("el", "la", "los", "es", "una", "por", "que", "para"),
    "pt": ("o", "a", "os", "é", "uma", "por", "não", "para"),
    "en": ("the", "and", "is", "of", "to", "a", "in", "that"),
}

_STOPWORDS = {
    w for words in _LANG_MARKERS.values() for w in words
}


class LangIdScorer:
    """Actor-pool stage: append lang_pred + quality columns.

    State built once per actor: marker dicts, compiled tokenizer.
    """

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.markers = {
            lang: frozenset(ws) for lang, ws in _LANG_MARKERS.items()
        }

    def classify(self, text: str) -> str:
        words = self.word_re.findall(text.lower())
        if not words:
            return "und"
        # CJK heuristic first
        cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
        if cjk > len(text) * 0.1:
            return "zh"
        best, best_hits = "und", 0
        wset = words if len(words) < 200 else words[:200]
        for lang, markers in self.markers.items():
            hits = sum(1 for w in wset if w in markers)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        preds = [self.classify(t or "") for t in texts]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized quality metrics: length, token count, stopword ratio,
    punctuation ratio, mean word length. Arrow kernels only — no loops."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    n_punct = pc.cast(
        pc.add(
            pc.count_substring(text, "."),
            pc.add(pc.count_substring(text, ","), pc.count_substring(text, "!")),
        ),
        pa.int64(),
    )
    mean_word_len = pc.divide(
        pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
        pc.cast(n_tokens, pa.float64()),
    )
    return (
        batch.append_column("n_chars_q", n_chars)
        .append_column("n_tokens", n_tokens)
        .append_column("n_punct", n_punct)
        .append_column("mean_word_len", mean_word_len)
    )


def stopword_ratio(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Stopword ratio (pandas str ops — used by the quality filter)."""
    toks = batch[text_col].str.lower().str.split()
    batch["stop_ratio"] = toks.map(
        lambda ws: sum(w in _STOPWORDS for w in ws) / max(1, len(ws)) if ws else 0.0
    )
    return batch


def rolling_fingerprint(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """Document fingerprint: min rolling polynomial hash over byte windows
    (winnowing-style). Vectorized per row over the byte array."""
    texts = batch[text_col].to_pylist()
    fps = np.empty(len(texts), dtype=np.uint64)
    base = np.uint64(1099511628211)
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode(), dtype=np.uint8).astype(np.uint64)
        if len(b) < window:
            acc = np.uint64(0xCBF29CE484222325)
            for x in b:
                acc = (acc ^ x) * base
            fps[i] = acc
            continue
        n = len(b) - window + 1
        acc = np.zeros(n, dtype=np.uint64)
        for k in range(window):
            acc = acc * base + b[k : k + n]
        fps[i] = acc.min()
    return batch.append_column(
        "fingerprint", pa.array(fps.astype(np.int64), pa.int64())
    )
