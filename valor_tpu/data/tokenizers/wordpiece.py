"""BERT WordPiece tokenizer, self-contained.

Functional equivalent of the reference's vendored HuggingFace tokenizer
(model/bert_tokenizer.py, 375 LoC): basic tokenization (lowercase, accent
strip, punctuation split, CJK spacing) + greedy longest-match-first
WordPiece with '##' continuations.  Loads a standard one-token-per-line
vocab file (bert-base-uncased-vocab.txt); special ids [CLS]=101 [SEP]=102
[MASK]=103 as asserted by the reference data layer (data/data.py:57-60).
"""

from __future__ import annotations

import unicodedata
from typing import Dict, List, Optional


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


class BasicTokenizer:
    def __init__(self, lowercase: bool = True):
        self.lowercase = lowercase

    def tokenize(self, text: str) -> List[str]:
        out_chars = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            if _is_cjk(cp):
                out_chars.extend([" ", ch, " "])
            elif _is_whitespace(ch):
                out_chars.append(" ")
            else:
                out_chars.append(ch)
        tokens = []
        for tok in "".join(out_chars).split():
            if self.lowercase:
                tok = tok.lower()
                tok = "".join(
                    c for c in unicodedata.normalize("NFD", tok)
                    if unicodedata.category(c) != "Mn"
                )
            # split punctuation into separate tokens
            cur: List[str] = []
            for ch in tok:
                if _is_punctuation(ch):
                    if cur:
                        tokens.append("".join(cur))
                        cur = []
                    tokens.append(ch)
                else:
                    cur.append(ch)
            if cur:
                tokens.append("".join(cur))
        return tokens


class WordPieceTokenizer:
    def __init__(self, vocab: Dict[str, int], unk: str = "[UNK]", max_chars: int = 100):
        self.vocab = vocab
        self.unk = unk
        self.max_chars = max_chars

    def tokenize(self, word: str) -> List[str]:
        if len(word) > self.max_chars:
            return [self.unk]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece: Optional[str] = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk]
            pieces.append(piece)
            start = end
        return pieces


class BertTokenizer:
    """vocab-file tokenizer with the reference's public surface:
    tokenize / convert_tokens_to_ids / convert_ids_to_tokens."""

    def __init__(self, vocab_file: str, lowercase: bool = True):
        self.vocab: Dict[str, int] = {}
        with open(vocab_file, encoding="utf-8") as f:
            for i, line in enumerate(f):
                tok = line.rstrip("\n")
                if tok:
                    self.vocab[tok] = i
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self.basic = BasicTokenizer(lowercase)
        self.wordpiece = WordPieceTokenizer(self.vocab)

    @property
    def cls_token_id(self) -> int:
        return self.vocab["[CLS]"]

    @property
    def sep_token_id(self) -> int:
        return self.vocab["[SEP]"]

    @property
    def mask_token_id(self) -> int:
        return self.vocab["[MASK]"]

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in self.basic.tokenize(text):
            out.extend(self.wordpiece.tokenize(word))
        return out

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        unk = self.vocab.get("[UNK]", 100)
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids: List[int]) -> List[str]:
        return [self.inv_vocab.get(i, "[UNK]") for i in ids]

    def encode(self, text: str) -> List[int]:
        return self.convert_tokens_to_ids(self.tokenize(text))

    def decode(self, ids: List[int]) -> str:
        """ids -> sentence, merging '##' pieces (reference decode_sequence,
        model/pretrain.py:146-163)."""
        words = self.convert_ids_to_tokens(ids)
        return " ".join(words).replace(" ##", "")
