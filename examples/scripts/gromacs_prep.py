#!/usr/bin/env python
"""Preprocess a GROMACS topology for use with mythos_tpu.

Command-line wrapper over ``preprocess_topology`` (grompp -pp), optionally
archiving the input directory first. Parity reference:
examples/scripts/gromacs_prep.py in mythos-bio/mythos.

Example usage::

    python examples/scripts/gromacs_prep.py /path/to/gromacs/input
    python examples/scripts/gromacs_prep.py /path/to/input --copy-to /path/to/archive
    python examples/scripts/gromacs_prep.py /path/to/input --params nsteps=5000 dt=0.002
"""

from __future__ import annotations

import argparse
import logging

from mythos_tpu.simulators.gromacs.utils import preprocess_topology

logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")


def parse_params(param_strings: list[str] | None) -> dict[str, str]:
    """Parse key=value strings."""
    params: dict[str, str] = {}
    for item in param_strings or []:
        if "=" not in item:
            raise SystemExit(f"Invalid parameter format '{item}'. Expected key=value.")
        key, value = item.split("=", 1)
        params[key.strip()] = value.strip()
    return params


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("input_dir", help="Directory containing the GROMACS input files.")
    parser.add_argument("--copy-to", default=None, help="Copy inputs here before preprocessing.")
    parser.add_argument("--output-prefix", default="preprocessed")
    parser.add_argument("--output-mdp-name", default="preprocessed.mdp")
    parser.add_argument("--gromacs-binary", default=None)
    parser.add_argument("--mdp-name", default="md.mdp")
    parser.add_argument("--topology-name", default="topol.top")
    parser.add_argument("--structure-name", default="membrane.gro")
    parser.add_argument("--index-name", default="index.ndx")
    parser.add_argument("--params", nargs="*", default=None, help="key=value .mdp overrides")
    args = parser.parse_args(argv)

    preprocess_topology(
        input_dir=args.input_dir,
        params=parse_params(args.params),
        copy_to=args.copy_to,
        output_prefix=args.output_prefix,
        output_mdp_name=args.output_mdp_name,
        gromacs_binary=args.gromacs_binary,
        mdp_name=args.mdp_name,
        topology_name=args.topology_name,
        structure_name=args.structure_name,
        index_name=args.index_name,
    )


if __name__ == "__main__":
    main()
