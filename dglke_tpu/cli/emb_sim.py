"""`dglke_tpu-emb_sim` — embedding-similarity topK
(reference: dglke_emb_sim, infer_emb_sim.py).

Formats: l_r (both lists), l_* (left list, all right), *_r, * (all x all);
exec modes: pairwise / all / batch_left; 5 similarity functions.
"""

from __future__ import annotations

import argparse

from dglke_tpu.models.infer import EmbSimInfer
from dglke_tpu.utils.translate import (
    load_entity_data,
    load_raw_emb_data,
    load_raw_emb_mapping,
)

FORMATS = ("l_r", "l_*", "*_r", "*")


def build_parser():
    p = argparse.ArgumentParser("dglke_tpu-emb_sim")
    p.add_argument("--mfile", type=str, default=None,
                   help="ID mapping file (required for --raw_data)")
    p.add_argument("--emb_file", type=str, default=None,
                   help=".npy embedding file to compute similarity over")
    p.add_argument("--format", type=str, required=True, choices=FORMATS)
    p.add_argument("--data_files", type=str, default=None, nargs="+")
    p.add_argument("--raw_data", default=False, action="store_true")
    p.add_argument("--exec_mode", type=str, default="all",
                   choices=["pairwise", "all", "batch_left"])
    p.add_argument("--topK", type=int, default=10)
    p.add_argument("--sim_func", type=str, default="cosine",
                   choices=["cosine", "l2", "l1", "dot", "ext_jaccard"])
    p.add_argument("--output", type=str, default="result.tsv")
    p.add_argument("--gpu", type=int, default=-1)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    assert args.emb_file is not None, \
        '--emb_file is required when scoring entity embeddings'

    data_files = args.data_files or []
    id2e_map = None
    head = tail = None
    if args.format == "l_r":
        if args.raw_data:
            head, id2e_map, e2id = load_raw_emb_data(data_files[0],
                                                     map_f=args.mfile)
            tail, _, _ = load_raw_emb_data(data_files[1], e2id_map=e2id)
        else:
            head = load_entity_data(data_files[0])
            tail = load_entity_data(data_files[1])
    elif args.format == "l_*":
        if args.raw_data:
            head, id2e_map, _ = load_raw_emb_data(data_files[0],
                                                  map_f=args.mfile)
        else:
            head = load_entity_data(data_files[0])
    elif args.format == "*_r":
        if args.raw_data:
            tail, id2e_map, _ = load_raw_emb_data(data_files[0],
                                                  map_f=args.mfile)
        else:
            tail = load_entity_data(data_files[0])
    elif args.format == "*":
        if args.raw_data:
            id2e_map = load_raw_emb_mapping(map_f=args.mfile)

    pairwise = args.exec_mode == "pairwise"
    bcast = args.exec_mode == "batch_left"

    model = EmbSimInfer(args.gpu, args.emb_file, args.sim_func)
    model.load_emb()
    result = model.topK(head, tail, bcast=bcast, pair_ws=pairwise,
                        k=args.topK)

    with open(args.output, "w") as f:
        f.write("left\tright\tscore\n")
        for hl, tl, sl in result:
            for h, t, s in zip(hl.tolist(), tl.tolist(), sl.tolist()):
                if args.raw_data:
                    h, t = id2e_map[int(h)], id2e_map[int(t)]
                f.write(f"{h}\t{t}\t{s}\n")
    print(f"Inference Done.\nThe result is saved in {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
