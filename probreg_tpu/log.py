"""Module logger (parity with reference probreg/log.py:1-6)."""

import logging

log = logging.getLogger("probreg_tpu")
log.setLevel(logging.INFO)
if not log.handlers:
    log.addHandler(logging.StreamHandler())
