"""Import-time stub for `edlib` (unused by the decode parity paths)."""


def __getattr__(name):
    raise NotImplementedError(
        'edlib.{} is not available in the cross-stack parity '
        'shim'.format(name))
