"""Feature-extraction CLI: volume in, anatomix features out.

Usage:
  python -m anatomix_tpu.extract_cli --input ct.nii.gz --output feats.npz \
      --hf_variant anatomix [--strategy auto] [--normalize unit]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from anatomix_tpu.extract import (
    make_feature_extractor,
    minmax,
    unit_normalize,
    zscore_normalize,
)
from anatomix_tpu.models.load import load_model
from anatomix_tpu.utils.nifti import load_volume, save_volume


def build_parser():
    p = argparse.ArgumentParser(description="anatomix feature extraction")
    p.add_argument("--input", type=str, required=True,
                   help=".nii/.nii.gz/.npy/.npz volume")
    p.add_argument("--output", type=str, required=True,
                   help="output .npz/.nii.gz (channel-last features)")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt_path", type=str, default=None)
    src.add_argument("--hf_variant", type=str, default=None)
    p.add_argument("--strategy", type=str, default="sliding",
                   choices=["sliding", "full", "full_tiled", "auto"])
    p.add_argument("--roi", type=int, default=128)
    p.add_argument("--overlap", type=float, default=0.8)
    p.add_argument("--sw_batch_size", type=int, default=None,
               help="windows per forward; default auto (2; ViT: 1)")
    p.add_argument("--minclip", type=float, default=None)
    p.add_argument("--maxclip", type=float, default=None)
    p.add_argument("--normalize", type=str, default="none",
                   choices=["none", "unit", "zscore"],
                   help="voxelwise feature normalization (dev models)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--num_downs", type=int, default=4)
    p.add_argument("--ngf", type=int, default=16)
    p.add_argument("--output_nc", type=int, default=16)
    p.add_argument("--norm", type=str, default="batch")
    p.add_argument("--interp", type=str, default="nearest")
    p.add_argument("--pooling", type=str, default="Max")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    plan, params = load_model(
        ckpt_path=args.ckpt_path, hf_variant=args.hf_variant,
        num_downs=args.num_downs, ngf=args.ngf, output_nc=args.output_nc,
        norm=args.norm, interp=args.interp, pooling=args.pooling,
    )
    vol, affine = load_volume(args.input)
    x = jnp.asarray(
        minmax(vol, args.minclip, args.maxclip)[None, ..., None]
    )
    extractor = make_feature_extractor(
        plan, params,
        strategy=args.strategy,
        roi_size=(args.roi,) * 3,
        overlap=args.overlap,
        sw_batch_size=args.sw_batch_size,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
    )
    feats = extractor(x)
    if args.normalize == "unit":
        feats = unit_normalize(feats)
    elif args.normalize == "zscore":
        feats = zscore_normalize(feats)
    feats_np = np.asarray(feats, np.float32)[0]
    if args.output.endswith((".nii", ".nii.gz")):
        save_volume(args.output, feats_np, affine)
    else:
        np.savez(args.output, features=feats_np, affine=affine)
    print(f"wrote {args.output} shape={feats_np.shape}")


if __name__ == "__main__":
    main()
