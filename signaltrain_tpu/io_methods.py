"""Reference-API facade for signaltrain.io_methods: plotting + wav I/O.

The reference module also carried a large dead AudioIO class (ffmpeg/pyglet,
io_methods.py:13-394) which SURVEY.md marks do-not-rebuild; WAV read/write
lives in data.audio_io.
"""

from .data.audio_io import read_audio_file, write_audio_file  # noqa: F401
from .utils.plots import plot_spectrograms, plot_valdata  # noqa: F401
