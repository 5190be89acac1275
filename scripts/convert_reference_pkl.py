#!/usr/bin/env python3
"""Convert a reference network pickle to the inclusivegan_tpu snapshot format.

The reference's pkls embed the defining TF module source and re-exec it on
load (/root/reference/dnnlib/tflib/network.py:255-299), so unpickling them
requires a TF1.14 environment. Two-stage flow:

  stage 1 (in a TF1 env, e.g. the reference's own docker):
      python scripts/dump_reference_vars.py network.pkl vars.npz
      # trivially: vars.npz = {f"{net}/{var_name}": value} for G, D, Gs

  stage 2 (here): this script maps the variable names onto the TPU param
  tree (the trees are keyed by the same variable-scope names by design,
  models/stylegan2.py module doc) and writes an
  ``inclusivegan_tpu.network_snapshot.v1`` pkl.
"""

import argparse
import pickle

import numpy as np


def vars_to_tree(var_dict, prefix):
    """'G_synthesis/4x4/Conv/weight' style names → nested dict tree."""
    tree = {}
    for name, value in var_dict.items():
        if not name.startswith(prefix):
            continue
        parts = name[len(prefix):].strip("/").split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return tree


def convert(vars_npz: str, out_pkl: str, resolution: int, num_channels: int,
            latent_size: int = 512, fmap_base: int = 8 << 10,
            g_arch: str = "skip", d_arch: str = "resnet",
            g_kwargs: dict = {}, d_kwargs: dict = {}):
    data = dict(np.load(vars_npz))

    def g_tree(net):
        mapping = vars_to_tree(data, f"{net}/G_mapping")
        synthesis = vars_to_tree(data, f"{net}/G_synthesis")
        noise = {k: v for k, v in synthesis.items() if k.startswith("noise")}
        for k in noise:
            synthesis.pop(k)
        return {
            "mapping": mapping,
            "synthesis": synthesis,
            "noise": noise,
            "dlatent_avg": np.asarray(
                data.get(f"{net}/dlatent_avg", np.zeros(latent_size))),
        }

    snap = {
        "format": "inclusivegan_tpu.network_snapshot.v1",
        "G": {"config": _g_config(resolution, num_channels, latent_size,
                                  fmap_base, g_arch, **g_kwargs),
              "params": g_tree("G")},
        "Gs": {"config": _g_config(resolution, num_channels, latent_size,
                                   fmap_base, g_arch, **g_kwargs),
               "params": g_tree("Gs")},
        "D": {"config": _d_config(resolution, num_channels, fmap_base,
                                  d_arch, **d_kwargs),
              "params": vars_to_tree(data, "D")},
    }
    with open(out_pkl, "wb") as f:
        pickle.dump(snap, f)
    print(f"wrote {out_pkl}")


def _g_config(resolution, num_channels, latent_size, fmap_base, arch,
              **kwargs):
    import dataclasses
    from inclusivegan_tpu.models import GMain
    G = GMain.create(resolution=resolution, num_channels=num_channels,
                     latent_size=latent_size, dlatent_size=latent_size,
                     fmap_base=fmap_base, architecture=arch, **kwargs)
    return dataclasses.asdict(G)


def _d_config(resolution, num_channels, fmap_base, arch, **kwargs):
    import dataclasses
    from inclusivegan_tpu.models import Discriminator
    D = Discriminator(resolution=resolution, num_channels=num_channels,
                      fmap_base=fmap_base, architecture=arch, **kwargs)
    return dataclasses.asdict(D)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("vars_npz")
    parser.add_argument("out_pkl")
    parser.add_argument("--resolution", type=int, required=True)
    parser.add_argument("--num-channels", type=int, default=3)
    parser.add_argument("--latent-size", type=int, default=512)
    parser.add_argument("--fmap-base", type=int, default=8 << 10)
    parser.add_argument("--g-arch", default="skip")
    parser.add_argument("--d-arch", default="resnet")
    args = parser.parse_args()
    convert(args.vars_npz, args.out_pkl, args.resolution, args.num_channels,
            args.latent_size, args.fmap_base, args.g_arch, args.d_arch)
