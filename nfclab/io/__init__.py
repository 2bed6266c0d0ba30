from .wav import read_wav, write_wav, WavInfo
from .golden import read_golden_frames, write_golden_frames
