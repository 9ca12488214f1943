"""`dglke_tpu-convert` — convert raw_udd (string triples) datasets into udd
(integer-id) form (reference: dglke_convert, convert.py).

Reads train/valid/test files of string triples, builds id maps, and writes
entities.tsv / relations.tsv plus *_id.tsv triple files in hrt or htr order.
"""

from __future__ import annotations

import argparse
import os

from dglke_tpu.data.dataset import load_raw_udd


def build_parser():
    p = argparse.ArgumentParser("dglke_tpu-convert")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--dataset", type=str, default="udd")
    p.add_argument("--data_files", type=str, required=True, nargs="+",
                   help="train [valid test] raw triple files")
    p.add_argument("--delimiter", type=str, default="\t")
    p.add_argument("--format", type=str, default="hrt",
                   choices=["hrt", "htr", "rht", "rth", "thr", "trh"],
                   help="column order of the input files")
    p.add_argument("--out_format", type=str, default="hrt",
                   choices=["hrt", "htr"],
                   help="column order of the output id files")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    ds = load_raw_udd(args.data_path, args.dataset, args.delimiter,
                      args.data_files, args.format)
    splits = {args.data_files[0]: ds.train}
    if len(args.data_files) == 3:
        splits[args.data_files[1]] = ds.valid
        splits[args.data_files[2]] = ds.test
    for fname, triples in splits.items():
        if triples is None:
            continue
        h, r, t = triples[0], triples[1], triples[2]
        base, _ = os.path.splitext(fname)
        out = os.path.join(args.data_path, base + "_id.tsv")
        with open(out, "w") as f:
            for i in range(len(h)):
                if args.out_format == "hrt":
                    f.write(f"{h[i]}\t{r[i]}\t{t[i]}\n")
                else:
                    f.write(f"{h[i]}\t{t[i]}\t{r[i]}\n")
        print(f"wrote {out}")
    print(f"id maps written to {args.data_path}/entities.tsv and "
          f"relations.tsv")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
