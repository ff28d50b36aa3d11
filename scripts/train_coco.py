#!/usr/bin/env python
"""Thin wrapper: same CLI as the reference scripts/train_coco.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_hrnet_tpu.cli.train_coco import build_parser, main

if __name__ == '__main__':
    main(**build_parser().parse_args().__dict__)
