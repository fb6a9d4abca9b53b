class ZstdCompressor:
    def __init__(self, **kw):
        pass
    def compress(self, b):
        raise NotImplementedError

class ZstdDecompressor:
    def decompress(self, b):
        raise NotImplementedError
