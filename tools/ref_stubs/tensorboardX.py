"""tensorboardX stub: a no-op SummaryWriter (logging side channel only)."""


class SummaryWriter:
    def __init__(self, *a, **k):
        pass

    def _noop(self, *a, **k):
        pass

    def __getattr__(self, name):
        return self._noop
