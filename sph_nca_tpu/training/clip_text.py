"""CLIP ViT-B/32 TEXT tower + BPE tokenizer in JAX/numpy.

The reference encodes its guide prompt with open_clip's text transformer
(/root/reference/code/nca.py:470-508: tokenizer('ViT-B-32') +
model.encode_text(normalize=True)). This module provides the same path
natively:

  * ``CLIPTextEncoder`` — 12-layer width-512 causal transformer, EOT-token
    pooling, text projection to the shared 512-d space, L2 normalize
    (open_clip ViT-B-32 text config: vocab 49408, context 77, heads 8);
  * ``SimpleTokenizer`` — the CLIP byte-pair encoding. The merges table
    (``bpe_simple_vocab_16e6.txt.gz``, shipped with every CLIP/open_clip
    install) must be supplied as a file — this environment has no model
    zoo. Without it, ``fallback_tokenize`` hashes UTF-8 bytes into the
    same id space so the full text->loss pipeline stays executable (NOT
    semantically CLIP — pair with random weights only);
  * ``convert_open_clip_text`` — open_clip state_dict -> our .npz.
"""

from __future__ import annotations

import dataclasses
import gzip
import html
from functools import lru_cache
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .clip_encoder import _block, _layernorm

Array = jnp.ndarray

VOCAB = 49408
CONTEXT = 77
T_WIDTH = 512
T_LAYERS = 12
T_HEADS = 8
EMBED = 512


# ---------------------------------------------------------------------------
# Tokenizer (CLIP SimpleTokenizer algorithm)
# ---------------------------------------------------------------------------


@lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable-unicode map (GPT-2/CLIP BPE)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def basic_clean(text: str) -> str:
    """open_clip's tokenize chain applies ftfy.fix_text then a double
    html.unescape. ftfy isn't in this image; its deterministic,
    prompt-relevant parts are reproduced here — NFC unicode
    normalization and control-character removal (mojibake repair, the
    heuristic remainder, cannot change well-formed prompts, which is
    what fix_text reduces to on valid input)."""
    import unicodedata

    text = html.unescape(html.unescape(text))
    text = unicodedata.normalize("NFC", text)
    text = "".join(
        ch for ch in text
        if unicodedata.category(ch) != "Cc" or ch in "\t\n"
    )
    return text.strip()


class SimpleTokenizer:
    """CLIP BPE over a merges file (bpe_simple_vocab_16e6.txt.gz)."""

    def __init__(self, bpe_path: str):
        import regex as re

        self.re = re
        self.byte_encoder = bytes_to_unicode()
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<start_of_text>", "<end_of_text>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<start_of_text>": "<start_of_text>",
            "<end_of_text>": "<end_of_text>",
        }
        self.pat = re.compile(
            r"""<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.sot = self.encoder["<start_of_text>"]
        self.eot = self.encoder["<end_of_text>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = self.re.sub(r"\s+", " ", basic_clean(text)).strip().lower()
        for token in self.re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        return bpe_tokens


def fallback_tokenize(text: str) -> List[int]:
    """Deterministic hash of UTF-8 bytes into the CLIP id space — keeps
    the text->loss pipeline executable without the merges file. Pair
    with random weights only (NOT semantically CLIP)."""
    return [
        (b * 191 + i * 7) % (VOCAB - 2) for i, b in enumerate(text.encode())
    ][: CONTEXT - 2]


def tokenize(
    texts: str | Sequence[str], tokenizer: Optional[SimpleTokenizer] = None
) -> np.ndarray:
    """texts -> int32 [N, 77] with <start>/<end> framing + zero pad
    (open_clip.tokenize semantics, truncation enabled)."""
    if isinstance(texts, str):
        texts = [texts]
    sot = VOCAB - 2 if tokenizer is None else tokenizer.sot
    eot = VOCAB - 1 if tokenizer is None else tokenizer.eot
    out = np.zeros((len(texts), CONTEXT), np.int32)
    for i, t in enumerate(texts):
        ids = tokenizer.encode(t) if tokenizer else fallback_tokenize(t)
        ids = [sot] + list(ids[: CONTEXT - 2]) + [eot]
        out[i, : len(ids)] = ids
    return out


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CLIPTextEncoder:
    """Weights as a dict of arrays; call with int tokens [77] or [N, 77];
    returns L2-normalized features [EMBED] / [N, EMBED]."""

    w: dict

    def encode_one(self, tokens: Array) -> Array:
        w = self.w
        t = w["token_embedding"][tokens] + w["t_pos_embedding"]  # [77, 512]
        mask = jnp.triu(
            jnp.full((CONTEXT, CONTEXT), -jnp.inf, jnp.float32), k=1
        )
        for i in range(T_LAYERS):
            t = _block(t, w, i, width=T_WIDTH, heads=T_HEADS, attn_mask=mask)
        t = _layernorm(t, w["ln_final_g"], w["ln_final_b"])
        # pool at the EOT token (highest id in the sequence — open_clip
        # text_global_pool 'argmax')
        feat = t[jnp.argmax(tokens)] @ w["text_proj"]
        return feat / jnp.linalg.norm(feat)

    def __call__(self, tokens) -> Array:
        tokens = jnp.asarray(tokens)
        if tokens.ndim == 1:
            return self.encode_one(tokens)
        return jax.vmap(self.encode_one)(tokens)


def load_text_encoder(path: str) -> CLIPTextEncoder:
    """Load a text tower .npz (convert_open_clip_text output). Text block
    keys carry a ``t_`` prefix on disk so one combined file can hold both
    towers (the image tower owns the bare ``blk{i}_`` names)."""
    data = np.load(path)
    w = {}
    for k in data.files:
        if k.startswith("t_blk"):
            w[k[2:]] = jnp.asarray(data[k])
        elif not k.startswith("blk") and k not in (
            "patch_kernel", "class_embedding", "pos_embedding",
            "ln_pre_g", "ln_pre_b", "ln_post_g", "ln_post_b", "proj",
        ):
            w[k] = jnp.asarray(data[k])
    return CLIPTextEncoder(w)


def random_text_encoder(seed: int = 1) -> CLIPTextEncoder:
    """Fixed-seed random text tower (pipeline tests without weights)."""
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.02):
        return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))

    w = {
        "token_embedding": r(VOCAB, T_WIDTH),
        "t_pos_embedding": r(CONTEXT, T_WIDTH),
        "ln_final_g": jnp.ones(T_WIDTH),
        "ln_final_b": jnp.zeros(T_WIDTH),
        "text_proj": r(T_WIDTH, EMBED),
    }
    for i in range(T_LAYERS):
        p = f"blk{i}_"
        w.update({
            p + "ln1_g": jnp.ones(T_WIDTH), p + "ln1_b": jnp.zeros(T_WIDTH),
            p + "ln2_g": jnp.ones(T_WIDTH), p + "ln2_b": jnp.zeros(T_WIDTH),
            p + "attn_w": r(T_WIDTH, 3 * T_WIDTH),
            p + "attn_b": jnp.zeros(3 * T_WIDTH),
            p + "attn_out_w": r(T_WIDTH, T_WIDTH),
            p + "attn_out_b": jnp.zeros(T_WIDTH),
            p + "mlp1_w": r(T_WIDTH, 4 * T_WIDTH),
            p + "mlp1_b": jnp.zeros(4 * T_WIDTH),
            p + "mlp2_w": r(4 * T_WIDTH, T_WIDTH),
            p + "mlp2_b": jnp.zeros(T_WIDTH),
        })
    return CLIPTextEncoder(w)


def convert_open_clip_text(state_dict, out_path: str) -> None:
    """open_clip ViT-B-32 text-side state_dict -> our .npz (keys:
    token_embedding.weight, positional_embedding, transformer.resblocks
    .{i}.*, ln_final.{weight,bias}, text_projection)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out = {
        "token_embedding": sd["token_embedding.weight"],
        "t_pos_embedding": sd["positional_embedding"],
        "ln_final_g": sd["ln_final.weight"],
        "ln_final_b": sd["ln_final.bias"],
        "text_proj": sd["text_projection"],
    }
    for i in range(T_LAYERS):
        rb = f"transformer.resblocks.{i}."
        p = f"t_blk{i}_"  # t_ prefix: no collision with image-tower keys
        out.update({
            p + "ln1_g": sd[rb + "ln_1.weight"],
            p + "ln1_b": sd[rb + "ln_1.bias"],
            p + "ln2_g": sd[rb + "ln_2.weight"],
            p + "ln2_b": sd[rb + "ln_2.bias"],
            p + "attn_w": sd[rb + "attn.in_proj_weight"].T,
            p + "attn_b": sd[rb + "attn.in_proj_bias"],
            p + "attn_out_w": sd[rb + "attn.out_proj.weight"].T,
            p + "attn_out_b": sd[rb + "attn.out_proj.bias"],
            p + "mlp1_w": sd[rb + "mlp.c_fc.weight"].T,
            p + "mlp1_b": sd[rb + "mlp.c_fc.bias"],
            p + "mlp2_w": sd[rb + "mlp.c_proj.weight"].T,
            p + "mlp2_b": sd[rb + "mlp.c_proj.bias"],
        })
    np.savez(out_path, **out)


def get_text_features(
    text: str,
    *,
    weights_path: Optional[str] = None,
    bpe_path: Optional[str] = None,
    seed: int = 1,
) -> Array:
    """Prompt -> normalized [EMBED] features (the reference's
    encode_text path, nca.py:487-490)."""
    tok = SimpleTokenizer(bpe_path) if bpe_path else None
    tokens = tokenize(text, tok)[0]
    enc = (
        load_text_encoder(weights_path)
        if weights_path
        else random_text_encoder(seed)
    )
    return enc(tokens)
