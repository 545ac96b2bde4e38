#!/usr/bin/env python3
"""prisma_tpu viewer — CLI-compatible with the reference view.py (needs rerun-sdk)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prisma_tpu.cli.view import main
if __name__ == "__main__":
    main()
