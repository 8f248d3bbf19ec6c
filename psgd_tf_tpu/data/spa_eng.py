"""Loader/tokenizer for the reference's tab-separated spa-eng corpus.

Reference parity: /root/reference/neural_machine_translation_with_attention.py:19-86.
The reference downloads `spa-eng.zip` (one `spa.txt`, lines of
``english<TAB>spanish``), preprocesses each sentence (strip accents via
NFD, lowercase, pad punctuation with spaces, drop every char outside
``a-zA-Z?.!,¿``, wrap in ``<start> .. <end>`` — ref :25-43), word-tokenizes
each language with a Keras ``Tokenizer(filters='')`` (ref :54-60), pads
post to the per-language max length, and takes an 80/20 train/val split
(ref :70-80).

Hermetic hosts have no egress, so this module never downloads: point it at
a staged copy. Staging recipe (any machine with egress):

    curl -LO http://storage.googleapis.com/download.tensorflow.org/data/spa-eng.zip
    unzip spa-eng.zip        # -> spa-eng/spa.txt
    PSGD_TF_TPU_SPA_ENG=/path/to/spa-eng/spa.txt \
        python -m pytest tests/test_real_nmt_parity.py -v

`load` accepts the ``spa.txt`` file itself, a directory containing it
(directly or under ``spa-eng/``), or the zip. Tokenizer semantics replicate
Keras exactly where the reference relies on them: ids ordered by frequency
(descending, first-appearance tie-break), id 0 reserved for padding, id 1 =
most frequent word. The reference's split uses sklearn's nondeterministic
shuffle (ref :80); ours is a seeded permutation so staged runs reproduce.
"""
from __future__ import annotations

import io
import os
import re
import unicodedata
import zipfile
from collections import Counter
from typing import NamedTuple

import numpy as np

_PUNCT = re.compile(r"([?.!,¿])")
_SPACES = re.compile(r'[" "]+')  # the reference's quirky class: quote or space
_NONWORD = re.compile(r"[^a-zA-Z?.!,¿]+")


def preprocess_sentence(w: str) -> str:
    """The reference's sentence normalization, byte-for-byte (ref :25-43)."""
    w = "".join(
        c
        for c in unicodedata.normalize("NFD", w.lower().strip())
        if unicodedata.category(c) != "Mn"
    )
    w = _PUNCT.sub(r" \1 ", w)
    w = _SPACES.sub(" ", w)
    w = _NONWORD.sub(" ", w)
    return "<start> " + w.strip() + " <end>"


class Tokenizer(NamedTuple):
    """Keras ``Tokenizer(filters='')`` replica (ref :54-56): whitespace
    split, ids by descending frequency (stable tie-break on first
    appearance), 0 = PAD (never assigned)."""

    word_index: dict[str, int]

    @property
    def vocab_size(self) -> int:
        # + 1 because of token 0 (ref :84-85)
        return len(self.word_index) + 1

    def encode(self, texts: list[str]) -> list[list[int]]:
        wi = self.word_index
        return [[wi[t] for t in s.split() if t in wi] for s in texts]

    def decode(self, ids) -> str:
        inv = {i: w for w, i in self.word_index.items()}
        return " ".join(inv[int(i)] for i in ids if int(i) in inv)


def fit_tokenizer(texts: list[str]) -> Tokenizer:
    counts = Counter()
    for s in texts:
        counts.update(s.split())
    # Counter iteration preserves first-appearance order; sorted() is
    # stable, so ties keep that order — exactly Keras' fit_on_texts
    ranked = sorted(counts.items(), key=lambda kv: kv[1], reverse=True)
    return Tokenizer({w: i + 1 for i, (w, _) in enumerate(ranked)})


def _read_lines(path: str) -> list[str]:
    """spa.txt from a file, a directory, or the distribution zip."""
    if os.path.isdir(path):
        for cand in ("spa.txt", os.path.join("spa-eng", "spa.txt"),
                     "spa-eng.zip"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                return _read_lines(p)
        raise FileNotFoundError(f"no spa.txt / spa-eng.zip under {path}")
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            name = next(n for n in zf.namelist() if n.endswith("spa.txt"))
            with zf.open(name) as f:
                return io.TextIOWrapper(f, encoding="utf-8").read().strip().split("\n")
    with open(path, encoding="utf-8") as f:
        return f.read().strip().split("\n")


def create_dataset(path: str, num_examples: int | None = None):
    """(english_sentences, spanish_sentences), both preprocessed
    (ref :48-51). Tolerates Tatoeba's attribution third column."""
    lines = _read_lines(path)[:num_examples]
    pairs = [[preprocess_sentence(w) for w in l.split("\t")[:2]] for l in lines]
    eng, spa = zip(*pairs)
    return list(eng), list(spa)


def _pad_post(seqs: list[list[int]]) -> np.ndarray:
    width = max(len(s) for s in seqs)
    out = np.zeros((len(seqs), width), np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


class SpaEng(NamedTuple):
    src_train: np.ndarray  # spanish (the reference's input language, ref :50)
    tgt_train: np.ndarray  # english
    src_val: np.ndarray
    tgt_val: np.ndarray
    src_tok: Tokenizer
    tgt_tok: Tokenizer


def load(path: str, num_examples: int | None = 30000, seed: int = 0,
         val_fraction: float = 0.2) -> SpaEng:
    """Full reference pipeline: read, preprocess, tokenize per language,
    pad post, 80/20 split (ref :63-80). Translation direction spa -> eng."""
    eng, spa = create_dataset(path, num_examples)
    src_tok, tgt_tok = fit_tokenizer(spa), fit_tokenizer(eng)
    src = _pad_post(src_tok.encode(spa))
    tgt = _pad_post(tgt_tok.encode(eng))
    perm = np.random.default_rng(seed).permutation(len(src))
    n_val = int(round(val_fraction * len(src)))
    tr, va = perm[n_val:], perm[:n_val]
    return SpaEng(src[tr], tgt[tr], src[va], tgt[va], src_tok, tgt_tok)


def staged_path() -> str | None:
    """The staging env hook (mirrors PSGD_TF_TPU_MNIST_DIR for D3)."""
    p = os.environ.get("PSGD_TF_TPU_SPA_ENG")
    if not p or not os.path.exists(p):
        return None
    try:
        _read_lines(p)
    except (FileNotFoundError, StopIteration):
        return None
    return p
