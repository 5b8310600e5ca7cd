"""open_clip shim: the reference imports it at module scope in
open_vocab/clip.py; CLIP is disabled in the parity config, so any actual
call raises."""


def __getattr__(name):
    raise ImportError(f"open_clip shim: {name} unavailable (CLIP disabled "
                      "in parity harness)")
