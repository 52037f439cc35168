from .catalog import DatasetCatalog, MetadataCatalog, get_text_list, is_thing_stuff_overlap
