"""Reference-layout wrapper: scripts/train_mpii.py -> cli.train_mpii
(the reference ships only train_coco; MPII is added capability)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_hrnet_tpu.cli.train_mpii import build_parser, main

if __name__ == '__main__':
    main(**build_parser().parse_args().__dict__)
