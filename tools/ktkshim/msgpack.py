def packb(obj, **kw):
    raise NotImplementedError("msgpack shim: JSON-only test")

def unpackb(b, **kw):
    raise NotImplementedError("msgpack shim: JSON-only test")
