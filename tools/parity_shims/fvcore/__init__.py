"""Minimal fvcore stand-in for the parity harness (no pip installs)."""
__version__ = "0.1.6"
