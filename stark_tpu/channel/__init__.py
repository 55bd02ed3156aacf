from stark_tpu.channel.channel import Channel, VerifierChannel, ChannelError

__all__ = ["Channel", "VerifierChannel", "ChannelError"]
