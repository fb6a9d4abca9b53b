import functools

def deprecated(*dargs, **dkw):
    def wrap(f):
        @functools.wraps(f)
        def inner(*a, **kw):
            return f(*a, **kw)
        return inner
    return wrap

class DeprecatedWarning(DeprecationWarning):
    def __init__(self, function=None, deprecated_in=None, removed_in=None, details=None):
        self.function = function
        self.deprecated_in = deprecated_in
        self.removed_in = removed_in
        self.details = details
        super().__init__(function, deprecated_in, removed_in, details)

fail_if_not_removed = deprecated
