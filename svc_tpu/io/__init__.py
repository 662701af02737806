"""Host I/O layer: bitstream wire format and video file access.

Replaces the reference's L2b bitstream contract (libs/codec.hpp) and its
reader/writer threads (apps/encoder.cpp:125-170, apps/decoder.cpp:55-86).
"""
