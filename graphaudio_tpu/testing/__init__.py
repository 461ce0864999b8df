"""Test-support code: the independent numpy oracle renderer."""

from graphaudio_tpu.testing.oracle import (  # noqa: F401
    OracleContext,
    OracleBufferSource,
    OracleGain,
    OracleBiQuad,
    OracleConvolver,
    OracleConstantSource,
    OracleStereoPanner,
)
