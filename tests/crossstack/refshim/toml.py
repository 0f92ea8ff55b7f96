"""Tiny `toml` stand-in: delegates to the stdlib tomllib for reads.

Only what the reference model-loading path touches.  Writing is not
needed by the parity harness.
"""
import tomllib


def load(f):
    if isinstance(f, str):
        with open(f, 'rb') as fh:
            return tomllib.load(fh)
    data = f.read()
    if isinstance(data, str):
        return tomllib.loads(data)
    return tomllib.loads(data.decode())


def loads(s):
    return tomllib.loads(s)


def dump(obj, f):
    raise NotImplementedError('toml.dump is not available in the shim')


def dumps(obj):
    raise NotImplementedError('toml.dumps is not available in the shim')
