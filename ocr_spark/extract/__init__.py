"""Deterministic text extraction (stand-in for the GPU OCR engines)."""
