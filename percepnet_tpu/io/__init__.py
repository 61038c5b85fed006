from percepnet_tpu.io.pcm import read_pcm16, write_pcm16  # noqa: F401
