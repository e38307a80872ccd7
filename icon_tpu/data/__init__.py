"""Host data pipeline (reference L1: lib/dataset/*.py) — numpy datasets in
the reference's on-disk layout plus a threaded prefetching loader."""
