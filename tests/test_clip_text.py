"""CLIP text tower + BPE tokenizer tests (hermetic: synthetic merges,
random weights)."""

import gzip
import os

import numpy as np
import pytest


def _write_merges(path):
    """Tiny merges table exercising the real BPE code path."""
    lines = ["#version: 0.2"]
    lines += ["h e", "he l", "hel l", "hell o</w>", "w o", "wo r",
              "wor l", "worl d</w>"]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))


def test_tokenizer_bpe_merges(tmp_path):
    from sph_nca_tpu.training.clip_text import CONTEXT, SimpleTokenizer, tokenize

    p = str(tmp_path / "merges.txt.gz")
    _write_merges(p)
    tok = SimpleTokenizer(p)
    toks = tokenize("hello world", tok)
    assert toks.shape == (1, CONTEXT)
    row = toks[0]
    assert row[0] == tok.sot
    n = int((row != 0).sum())
    assert row[n - 1] == tok.eot
    # "hello" fully merges into the single token "hello</w>"
    assert tok.bpe("hello") == "hello</w>"
    assert tok.bpe("world") == "world</w>"
    # unknown words fall back to char-level pieces, all in vocab
    ids = tok.encode("xyzzy")
    assert all(0 <= i < len(tok.encoder) for i in ids)
    # deterministic
    assert np.array_equal(tokenize("hello world", tok),
                          tokenize("hello world", tok))


def test_fallback_tokenize_shape():
    from sph_nca_tpu.training.clip_text import CONTEXT, VOCAB, tokenize

    t = tokenize(["a colorful pile of jellybeans", "zebra"])
    assert t.shape == (2, CONTEXT)
    assert (t >= 0).all() and (t < VOCAB).all()


def test_text_encoder_runs_and_normalizes():
    import jax.numpy as jnp

    from sph_nca_tpu.training.clip_text import (
        random_text_encoder,
        tokenize,
    )

    enc = random_text_encoder()
    toks = tokenize(["hello world", "a zebra"])
    f = enc(toks)
    assert f.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(f), axis=-1), 1.0, rtol=1e-5
    )
    # EOT pooling: different prompts -> different features
    assert not np.allclose(np.asarray(f[0]), np.asarray(f[1]))


def test_convert_open_clip_text_roundtrip(tmp_path):
    """Converter accepts an open_clip-shaped text state_dict and the
    loaded tower encodes (shape/orientation check of every key)."""
    from sph_nca_tpu.training.clip_text import (
        CONTEXT, T_LAYERS, T_WIDTH, VOCAB,
        convert_open_clip_text, load_text_encoder, tokenize,
    )

    rng = np.random.default_rng(0)
    sd = {
        "token_embedding.weight": rng.normal(size=(VOCAB, T_WIDTH)),
        "positional_embedding": rng.normal(size=(CONTEXT, T_WIDTH)),
        "ln_final.weight": np.ones(T_WIDTH),
        "ln_final.bias": np.zeros(T_WIDTH),
        "text_projection": rng.normal(size=(T_WIDTH, 512)),
    }
    for i in range(T_LAYERS):
        rb = f"transformer.resblocks.{i}."
        sd.update({
            rb + "ln_1.weight": np.ones(T_WIDTH),
            rb + "ln_1.bias": np.zeros(T_WIDTH),
            rb + "ln_2.weight": np.ones(T_WIDTH),
            rb + "ln_2.bias": np.zeros(T_WIDTH),
            rb + "attn.in_proj_weight": rng.normal(
                size=(3 * T_WIDTH, T_WIDTH), scale=0.02),
            rb + "attn.in_proj_bias": np.zeros(3 * T_WIDTH),
            rb + "attn.out_proj.weight": rng.normal(
                size=(T_WIDTH, T_WIDTH), scale=0.02),
            rb + "attn.out_proj.bias": np.zeros(T_WIDTH),
            rb + "mlp.c_fc.weight": rng.normal(
                size=(4 * T_WIDTH, T_WIDTH), scale=0.02),
            rb + "mlp.c_fc.bias": np.zeros(4 * T_WIDTH),
            rb + "mlp.c_proj.weight": rng.normal(
                size=(T_WIDTH, 4 * T_WIDTH), scale=0.02),
            rb + "mlp.c_proj.bias": np.zeros(T_WIDTH),
        })
    out = str(tmp_path / "text.npz")
    convert_open_clip_text(sd, out)
    enc = load_text_encoder(out)
    f = enc(tokenize("hello")[0])
    assert f.shape == (512,)
    assert np.isfinite(np.asarray(f)).all()


def test_train_cli_clip_mode(tmp_path):
    """--loss clip_multiscale trains end-to-end (random towers, fallback
    tokenizer) without SystemExit — the reference's text mode
    (train-example.sh jellybeans block)."""
    from sph_nca_tpu.cli.train import main

    out = str(tmp_path / "ckpt")
    rc = main([
        "--loss", "clip_multiscale", "--clip_guide", "jellybeans",
        "--image_size", "12", "--h", "0.34", "--training_iter", "2",
        "--batch_size", "2", "--pool_size", "4", "--steps_range", "2,3",
        "--steps_increment", "1", "--channels", "8", "--hidden", "16",
        "--checkpoint_every", "2", "--output_dir", out, "--log_every", "1",
        "--use_alpha", "false", "--wrap", "true", "--use_3d", "false",
        "--initial_feature", "random", "--clip_multiscale_scales", "1",
        "--save_resume", "false",
    ])
    assert rc == 0
    assert any(e.startswith("sphnca-") for e in os.listdir(out))


def test_get_text_features_pipeline():
    from sph_nca_tpu.training.clip_text import get_text_features

    f = get_text_features("a pile of jellybeans")
    assert f.shape == (512,)
    np.testing.assert_allclose(float(np.linalg.norm(np.asarray(f))), 1.0,
                               rtol=1e-5)


def test_basic_clean_normalizes_unicode():
    """ftfy-chain parity on its deterministic parts: NFC composition,
    control-char stripping, double html unescape."""
    from sph_nca_tpu.training.clip_text import basic_clean

    # NFC: decomposed e + combining acute -> precomposed
    assert basic_clean("café") == "café"
    # control chars dropped, entities unescaped twice
    assert basic_clean("a\x00b &amp;amp; c") == "ab & c"
    assert basic_clean("  plain ascii  ") == "plain ascii"
