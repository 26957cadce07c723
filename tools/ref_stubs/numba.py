"""numba stub: pass-through @jit (only decorates P.56 helpers in segan/utils.py)."""


def jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(f):
        return f

    return deco


int32 = float32 = None
