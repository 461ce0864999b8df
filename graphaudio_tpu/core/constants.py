"""Engine-wide constants.

Mirrors the reference's design constants (GraphAudio.Core/AudioBuffer.cs:10,
AudioContextBase.cs:35) so graph topologies and scheduling semantics port 1:1.
"""

# Render quantum: every node processes audio in fixed blocks of this many
# frames (reference: AudioBuffer.FramesPerBlock, GraphAudio.Core/AudioBuffer.cs:10).
FRAMES_PER_BLOCK = 128

# Default context sample rate (reference: AudioContextBase.cs:35).
DEFAULT_SAMPLE_RATE = 48000

# Maximum channels per buffer (reference: AudioBuffer.cs:18).
MAX_CHANNELS = 32

# Default number of 128-frame quanta rendered per device step ("superblock").
# Offline rendering scans the compiled graph function over superblocks so the
# per-step dispatch overhead is amortized across S quanta. This is a pure
# performance knob: rendering is block-exact regardless of S.
DEFAULT_SUPERBLOCK = 16
