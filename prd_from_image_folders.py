#!/usr/bin/env python3
"""Root-level shim for the PRD folder CLI — surface parity with the
reference's standalone precision-recall-distributions tool
(/root/reference/precision-recall-distributions/prd_from_image_folders.py)."""

from inclusivegan_tpu.prd.prd_from_image_folders import main

if __name__ == "__main__":
    main()
