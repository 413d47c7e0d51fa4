from tpu_sdr.transport.framing import (  # noqa: F401
    FRAME_SIZE_BYTES,
    PACKETS_PER_FRAME,
    PACKET_DATA_SIZE,
    MultiPacketAssembler,
    decode_frame,
    frame_to_packets,
    packets_to_frame,
    spectrum_to_frame_bytes,
)
from tpu_sdr.transport.crc32 import crc32_ethernet  # noqa: F401
