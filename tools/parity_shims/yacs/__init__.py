"""Minimal yacs stand-in for the parity harness (no pip installs allowed).

Implements just enough CfgNode semantics for detectron2's defaults.py and the
reference's add_hipie_config: attribute get/set, nesting, merge_from_file /
merge_from_list / merge_from_other_cfg, clone, freeze/defrost, new_allowed.
"""
