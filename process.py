#!/usr/bin/env python3
"""prisma_tpu orchestrator — CLI-compatible with the reference process.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prisma_tpu.cli.process import main

if __name__ == "__main__":
    main()
