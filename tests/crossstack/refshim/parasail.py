"""Import-time stub for `parasail` (unused by the decode parity paths).

Reference modules reference constants like ``parasail.dnafull`` in
default arguments at import time, so attribute access must succeed;
only *using* the stub (calling it) raises.
"""


class _Placeholder:
    def __init__(self, name):
        self._name = name

    def __call__(self, *args, **kwargs):
        raise NotImplementedError(
            'parasail.{} is not available in the cross-stack parity '
            'shim'.format(self._name))

    def __getattr__(self, item):
        return _Placeholder('{}.{}'.format(self._name, item))

    def __repr__(self):
        return '<parasail shim: {}>'.format(self._name)


def __getattr__(name):
    return _Placeholder(name)
