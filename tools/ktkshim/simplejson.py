from json import *  # noqa
import json as _json
dumps = _json.dumps
loads = _json.loads
load = _json.load
dump = _json.dump
