"""pycocotools shim for the parity harness: only the mask codec subset the
reference model/data path touches, backed by hipie_tpu.evaluation.rle."""
