from . import bits, cfo, chanest, fft, modulation, sync  # noqa: F401
