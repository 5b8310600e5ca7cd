class COCO:
    def __init__(self, *a, **k):
        raise NotImplementedError("COCO api not on parity path")
