OFFSET = 256 * 256 * 256
VOID = 0


class PQStat:
    def __init__(self):
        raise NotImplementedError("panoptic eval not on parity path")


def pq_compute(*a, **k):
    raise NotImplementedError("panoptic eval not on parity path")


def pq_compute_multi_core(*a, **k):
    raise NotImplementedError("panoptic eval not on parity path")
