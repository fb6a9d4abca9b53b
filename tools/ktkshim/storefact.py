def get_store_from_url(url):
    raise NotImplementedError("storefact shim")
