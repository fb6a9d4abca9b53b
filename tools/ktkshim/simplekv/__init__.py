import os


class KeyValueStore:
    """Minimal filesystem-backed stand-in for simplekv.KeyValueStore."""

    def __init__(self, root):
        self.root = root

    def _p(self, key):
        return os.path.join(self.root, key)

    def get(self, key):
        p = self._p(key)
        if not os.path.exists(p):
            raise KeyError(key)
        with open(p, "rb") as f:
            return f.read()

    def put(self, key, value):
        p = self._p(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(value)
        return key

    def delete(self, key):
        p = self._p(key)
        if os.path.exists(p):
            os.remove(p)

    def keys(self, prefix=""):
        out = []
        for dirpath, _dirs, files in os.walk(self.root):
            for fn in files:
                rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                rel = rel.replace(os.sep, "/")
                if rel.startswith(prefix):
                    out.append(rel)
        return sorted(out)

    def iter_keys(self, prefix=""):
        return iter(self.keys(prefix))

    def open(self, key):
        import io
        return io.BytesIO(self.get(key))

    def iter_prefixes(self, delimiter, prefix=""):
        seen = set()
        for k in self.keys(prefix):
            rest = k[len(prefix):]
            if delimiter in rest:
                p = prefix + rest.split(delimiter)[0] + delimiter
                if p not in seen:
                    seen.add(p)
                    yield p
            else:
                yield k
