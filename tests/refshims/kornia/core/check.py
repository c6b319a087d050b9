"""kornia.core.check shim: shape validators with kornia's semantics
(letters are free dims, numbers must match exactly)."""


def KORNIA_CHECK(condition, msg: str = ""):
    if not condition:
        raise Exception(msg)


def KORNIA_CHECK_SHAPE(x, shape):
    if len(x.shape) != len(shape):
        raise Exception(f"shape {tuple(x.shape)} != spec {shape}")
    for dim, spec in zip(x.shape, shape):
        if str(spec).isdigit() and dim != int(spec):
            raise Exception(f"shape {tuple(x.shape)} != spec {shape}")


def KORNIA_CHECK_SAME_SHAPE(x, y):
    if tuple(x.shape) != tuple(y.shape):
        raise Exception(f"{tuple(x.shape)} != {tuple(y.shape)}")
