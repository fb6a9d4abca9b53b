import urllib.parse

def quote(value, quoting=None):
    if isinstance(value, bytes):
        s = value.decode("utf-8")
    else:
        s = str(value)
    # PYTHON_3_7_QUOTING keeps [A-Za-z0-9_.~-] unescaped (safe="")
    return urllib.parse.quote(s, safe="~").encode("utf-8")

def unquote(value):
    if isinstance(value, bytes):
        value = value.decode("utf-8")
    return urllib.parse.unquote(value).encode("utf-8")
