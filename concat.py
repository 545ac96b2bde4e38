#!/usr/bin/env python3
"""prisma_tpu contact sheet — CLI-compatible with the reference concat.py."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prisma_tpu.cli.concat import main
if __name__ == "__main__":
    main()
