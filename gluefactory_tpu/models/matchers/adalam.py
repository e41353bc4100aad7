"""AdaLAM matcher placeholder (the reference's `models/matchers/adalam.py` is
an empty placeholder too)."""
