"""Files shipped to Spark workers via addPyFile so the keras stub is
importable as ``keras`` inside scoring UDFs (the driver installs the
stub into sys.modules; worker processes import by name)."""
