from .mapreduce import LocalClient, MapReduceJob, load_functions  # noqa: F401
