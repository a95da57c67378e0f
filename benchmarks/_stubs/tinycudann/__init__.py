"""tinycudann import stub: lets ``import instantngp`` (reference) succeed on a
CPU-only box. Any actual use raises — only the vanilla path is CPU-runnable.
"""


def _unavailable(*args, **kwargs):
    raise RuntimeError(
        "tiny-cuda-nn is CUDA-only; the reference NGP path cannot run here"
    )


class Encoding:
    def __init__(self, *a, **k):
        _unavailable()


class Network:
    def __init__(self, *a, **k):
        _unavailable()


class NetworkWithInputEncoding:
    def __init__(self, *a, **k):
        _unavailable()
