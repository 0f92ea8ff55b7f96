"""Run REFERENCE medaka decode code on medaka_tpu-produced artifacts.

Executed as a subprocess by ``tests/test_crossstack.py`` with a sys.path
that exposes: the dependency shims (``refshim/``), the cffi-built
reference C kernel (``_build/``), the reference package
(``/root/reference``), and this repo (for the shims' own IO backends).

Commands:

  prep_hdf  <in.hdf> <out.hdf>
      Copy a medaka_tpu probability HDF and rewrite its metadata in the
      reference's pickled format so reference DataStore/DataIndex can
      consume it.
  stitch    <probs.hdf> <draft.fasta> <out.fasta> [--qualities] [--fill_char C]
      Run reference ``medaka.stitch.stitch``.
  vcf       <probs.hdf> <ref.fasta> <out.vcf> [--gvcf] [--ambig_ref]
      Run reference ``medaka.variant.variants_from_hdf``.
  gru_forward <weights.npz> <config.toml> <batch.npy> <out.npy>
      Instantiate the reference torch GRUModel from an exported
      medaka_tpu model and run a forward pass.
"""
import argparse
import pathlib
import shutil
import sys

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent.parent
for p in (str(HERE / 'refshim'), str(HERE / '_build'),
          '/root/reference', str(REPO)):
    if p not in sys.path:
        sys.path.insert(0, p)

# Build the cffi libmedaka module on demand so a fresh checkout (empty
# ``_build/``) works without a manual bootstrap step.
if not list((HERE / '_build').glob('libmedaka*.so')):
    import build_libmedaka
    build_libmedaka.build()
    # the finder may have cached the (previously empty/absent) _build
    # directory listing before the .so appeared
    import importlib
    importlib.invalidate_caches()


def prep_hdf(args):
    import pickle

    import h5py
    import numpy as np

    import medaka.labels

    shutil.copyfile(args.input, args.output)
    with h5py.File(args.output, 'r+') as fh:
        if 'meta' in fh:
            del fh['meta']
        if 'samples/registry' in fh:
            del fh['samples/registry']
        scheme = medaka.labels.HaploidLabelScheme()
        fh['meta/label_scheme'] = np.bytes_(pickle.dumps(scheme))
    print('prepared', args.output)


def stitch(args):
    import medaka.stitch
    ns = argparse.Namespace(
        inputs=[args.hdf], draft=args.draft, output=args.output,
        regions=None, threads=1, fillgaps=True, fill_char=args.fill_char,
        qualities=args.qualities, min_depth=0)
    medaka.stitch.stitch(ns)
    print('reference stitch ->', args.output)


def vcf(args):
    import medaka.variant
    ns = argparse.Namespace(
        inputs=[args.hdf], ref_fasta=args.ref_fasta, output=args.output,
        regions=None, verbose=False, ambig_ref=args.ambig_ref,
        gvcf=args.gvcf)
    medaka.variant.variants_from_hdf(ns)
    print('reference vcf ->', args.output)


def gru_forward(args):
    import tarfile
    import tempfile

    import numpy as np
    import torch

    import medaka.architectures
    import toml as toml_shim

    with tempfile.TemporaryDirectory() as tdir:
        with tarfile.open(args.export_tgz) as tar:
            tar.extractall(tdir, filter='data')
        cfg = toml_shim.load(
            str(pathlib.Path(tdir) / 'model' / 'config.toml'))
        state = torch.load(
            str(pathlib.Path(tdir) / 'model' / 'weights.pt'),
            weights_only=True)
    kwargs = dict(cfg['model'].get('kwargs', {}))
    model = medaka.architectures.GRUModel(**kwargs)
    model.load_state_dict(state)
    model.eval()
    batch = torch.from_numpy(np.load(args.batch))
    with torch.inference_mode():
        out = model(batch)
    np.save(args.output, out.numpy())
    print('reference gru_forward ->', args.output)


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest='cmd', required=True)

    p = sub.add_parser('prep_hdf')
    p.add_argument('input')
    p.add_argument('output')
    p.set_defaults(func=prep_hdf)

    p = sub.add_parser('stitch')
    p.add_argument('hdf')
    p.add_argument('draft')
    p.add_argument('output')
    p.add_argument('--qualities', action='store_true')
    p.add_argument('--fill_char', default=None)
    p.set_defaults(func=stitch)

    p = sub.add_parser('vcf')
    p.add_argument('hdf')
    p.add_argument('ref_fasta')
    p.add_argument('output')
    p.add_argument('--gvcf', action='store_true')
    p.add_argument('--ambig_ref', action='store_true')
    p.set_defaults(func=vcf)

    p = sub.add_parser('gru_forward')
    p.add_argument('export_tgz')
    p.add_argument('batch')
    p.add_argument('output')
    p.set_defaults(func=gru_forward)

    args = parser.parse_args()
    args.func(args)


if __name__ == '__main__':
    main()
