#!/usr/bin/env python
"""Entry point — mirrors the reference's `python main.py ...` usage."""
from convnet_tpu.cli.main import main

if __name__ == "__main__":
    main()
