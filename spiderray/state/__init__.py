"""Partition manifests / checkpoint-resume bookkeeping."""
