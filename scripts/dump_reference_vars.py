#!/usr/bin/env python3
"""Stage 1 of reference-pkl conversion — RUN THIS IN A TF1.14 ENVIRONMENT
(e.g. the reference repo's own docker), not in this framework's container.

Unpickles a reference network pkl (which re-execs its embedded TF module
source, /root/reference/dnnlib/tflib/network.py:267-299) and dumps every
variable of the (G, D, Gs) triple to an npz keyed
'<net>/<scope>/<var>' — consumed by scripts/convert_reference_pkl.py.

Usage (inside the TF1 env, reference repo on sys.path):
    python dump_reference_vars.py network-snapshot.pkl vars.npz
"""

import pickle
import sys

import numpy as np


def main():
    pkl_path, out_path = sys.argv[1], sys.argv[2]
    import dnnlib.tflib as tflib  # reference repo must be importable
    tflib.init_tf()
    with open(pkl_path, "rb") as f:
        nets = pickle.load(f)
    if not isinstance(nets, (list, tuple)):
        nets = [nets]
    names = ["G", "D", "Gs"][:len(nets)]
    out = {}
    for name, net in zip(names, nets):
        for var_name, value in net.vars.items():
            out[f"{name}/{var_name}"] = np.asarray(value.eval())
    np.savez(out_path, **out)
    print(f"dumped {len(out)} variables to {out_path}")


if __name__ == "__main__":
    main()
