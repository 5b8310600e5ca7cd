"""torchvision.transforms shim: import-compatible stubs (CLIP disabled in
the parity harness; any actual use raises)."""


class _Stub:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        raise NotImplementedError("torchvision.transforms shim")


Compose = Resize = CenterCrop = Normalize = ToTensor = InterpolationMode = _Stub


def __getattr__(name):
    return _Stub
