class YTVOSeval:
    def __init__(self, *a, **k):
        raise NotImplementedError("video eval not on parity path")
