#!/usr/bin/env python
"""Bootstrap + harness for FULL-MODEL parity vs the reference torch HIPIE.

Loads the reference implementation from /root/reference on CPU (its pure-
pytorch MSDA fallback, ops/functions/ms_deform_attn_func.py:43-63, runs
without CUDA), with the missing third-party deps supplied by the minimal
shims in tools/parity_shims (no pip installs in this image).

The reference package is loaded WITHOUT executing hipie/__init__.py (which
drags in the full data/open-vocab stack); submodules are imported directly.

Usage:
    python tools/parity_ref.py build       # instantiate ref model, print stats
    python tools/parity_ref.py forward     # run ref fwd, dump stage outputs
"""

from __future__ import annotations

import os
import sys
import types

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SHIMS = os.path.join(REPO, "tools", "parity_shims")
REF = "/root/reference"


def bootstrap():
    """Path + compat setup. Import-order sensitive; call before any d2 use."""
    for p in (SHIMS, REPO, REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    # Pillow >= 10 removed the top-level resampling aliases d2 references.
    import PIL.Image as Image
    for name, repl in [("LINEAR", "BILINEAR"), ("CUBIC", "BICUBIC"),
                       ("NEAREST", "NEAREST"), ("BILINEAR", "BILINEAR"),
                       ("BICUBIC", "BICUBIC"), ("LANCZOS", "LANCZOS")]:
        if not hasattr(Image, name):
            setattr(Image, name, getattr(Image.Resampling, repl))

    # transformers >= 4.27 moved apply_chunking_to_forward out of
    # modeling_utils; the reference imports the old location.
    import transformers.modeling_utils as _mu
    import transformers.pytorch_utils as _pu
    for _name in ("apply_chunking_to_forward",
                  "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(_mu, _name) and hasattr(_pu, _name):
            setattr(_mu, _name, getattr(_pu, _name))

    # neutralize torch.cuda.amp.custom_fwd(cast_inputs=float32): on the f64
    # noise-floor run it would silently downcast encoder/pixel-decoder inputs
    # back to f32 (decorator applied at class-definition time, so patch before
    # the hipie modules import). No-op for the f32 run.
    import torch
    def _identity_custom_fwd(fwd=None, **_kw):
        if fwd is not None:
            return fwd
        return lambda f: f
    torch.cuda.amp.custom_fwd = _identity_custom_fwd
    if hasattr(torch, "amp") and hasattr(torch.amp, "custom_fwd"):
        torch.amp.custom_fwd = _identity_custom_fwd

    # register the reference package WITHOUT running hipie/__init__.py
    if "hipie" not in sys.modules:
        pkg = types.ModuleType("hipie")
        pkg.__path__ = [os.path.join(REF, "projects", "HIPIE", "hipie")]
        pkg.__package__ = "hipie"
        sys.modules["hipie"] = pkg


def make_local_bert(tmpdir: str, vocab_words=None):
    """Create a local bert-base-uncased directory (config + random weights +
    wordpiece vocab) so the reference's from_pretrained calls resolve offline.
    The vocab is the same toy vocab our WordPieceTokenizer.toy() uses, so both
    sides tokenize identically."""
    import torch
    from transformers import BertConfig, BertModel

    d = os.path.join(tmpdir, "projects", "HIPIE", "bert-base-uncased")
    if os.path.exists(os.path.join(d, "config.json")):
        return d
    os.makedirs(d, exist_ok=True)
    toy = parity_tokenizer()
    vocab = [t for t, _ in sorted(toy.vocab.items(), key=lambda kv: kv[1])]
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    # hidden 768 is hard-coded as language_dim in the reference BertEncoder;
    # 4 layers keeps the CPU forward tractable (layer count comes from this
    # config.json on BOTH sides).
    cfg = BertConfig(vocab_size=len(vocab), num_hidden_layers=4)
    torch.manual_seed(0)
    model = BertModel(cfg, add_pooling_layer=False)
    model.save_pretrained(d)
    cfg.save_pretrained(d)
    return d


def build_ref_cfg(overrides=()):
    """Reference config: d2 defaults + add_hipie_config + R50 parity prefs."""
    from detectron2.config import get_cfg
    from hipie.config import add_hipie_config

    cfg = get_cfg()
    add_hipie_config(cfg)
    cfg.MODEL.DEVICE = "cpu"
    if overrides:
        cfg.merge_from_list(list(overrides))
    return cfg


PARITY_WORDS = ("circle", "square", "triangle", "sky", "grass", "the", "at",
                "top", "bottom", "left", "right", "middle", "person", "cat",
                "dog", "car", "red", "big")


def make_scratch_cwd(tmpdir: str) -> str:
    """CWD for the reference: it resolves 'projects/HIPIE/...' relative paths
    (bert dir, maskdino config) against the working directory."""
    os.makedirs(os.path.join(tmpdir, "projects", "HIPIE"), exist_ok=True)
    cfgs = os.path.join(tmpdir, "projects", "HIPIE", "configs")
    if not os.path.exists(cfgs):
        os.symlink(os.path.join(REF, "projects", "HIPIE", "configs"), cfgs)
    make_local_bert(tmpdir)
    return tmpdir


def parity_tokenizer():
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    return WordPieceTokenizer.toy(words=PARITY_WORDS)


def build_ref_model(tmpdir: str = "/tmp/hipie_parity", overrides=(),
                    train: bool = False):
    """Instantiate the reference HIPIE_IMG on CPU with seeded random weights."""
    import torch

    bootstrap()
    make_scratch_cwd(tmpdir)
    os.chdir(tmpdir)

    cfg = build_ref_cfg()
    cfg.merge_from_file(os.path.join(
        REF, "projects", "HIPIE", "configs", "training", "r50.yaml"))
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.CLIP.ENABLED = False
    cfg.SAM.ENABLED = False
    if overrides:
        cfg.merge_from_list(list(overrides))

    torch.manual_seed(0)
    from hipie.hipie_img import HIPIE_IMG
    model = HIPIE_IMG(cfg)
    model.train(train)
    return model, cfg


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("cmd", nargs="?", default="cfg")
    args = p.parse_args()
    if args.cmd == "cfg":
        bootstrap()
        cfg = build_ref_cfg()
        print("cfg ok;", len(cfg.MODEL), "MODEL keys")
    elif args.cmd == "build":
        model, cfg = build_ref_model()
        n = sum(p.numel() for p in model.parameters())
        print(f"ref model ok: {n/1e6:.1f}M params")
