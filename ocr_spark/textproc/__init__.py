"""Text-branch operators: boilerplate strip, language ID, quality, tokens,
fingerprints — the text-density/link-density side of the north_rule."""
