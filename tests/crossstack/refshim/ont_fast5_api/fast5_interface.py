"""Stub: reference rle.py imports get_fast5_file at module level."""


def get_fast5_file(*args, **kwargs):
    raise NotImplementedError(
        'ont_fast5_api is not available in the cross-stack parity shim')
