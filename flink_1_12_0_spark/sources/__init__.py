"""Sources & sinks tier: file formats, CDC envelope decoders, datagen
(reference: flink-connectors/*, flink-formats/*)."""
