def __getattr__(name):
    raise ImportError(f"torchvision.models shim: {name} not on parity path")
