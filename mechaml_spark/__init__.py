"""mechaml_spark — a PySpark-native crawl frontier + fetch scheduler.

A from-scratch engine with the capabilities of yannham/mechaml
(a WWW::Mechanize-style OCaml scraping library), re-expressed
Spark-first: pages, links, images and forms are columns of
DataFrames; extraction is a vectorized Arrow UDF; the crawl loop is
a superstep over an exactly-ordered, politeness-budgeted frontier
table with a partitioned bloom-filter URL-seen set.

Layout
------
urlkit       URL resolution + crawl canonicalization (Uri.resolve parity)
htmlkit      stdlib HTML parser -> node records; CSS-subset selector compiler
extract      mapInPandas page-parse UDF (base_uri, links[], images[], forms[])
page         Page-equivalent DataFrame transforms (links_with/images_with/...)
forms        form-state column algebra + submit request synthesis
cookies      cookie jar table ops, Set-Cookie parser, match join
formatting   Color/Date/Time validated formatting (format.ml parity)
corpus       deterministic synthetic crawl corpus + image/caption tables
imaging      stdlib PNG/PPM codecs, PSNR, content hash (no PIL in-sandbox)
frontier     frontier table, snapshot store, bloom seen-set, politeness,
             superstep scheduler, sequential reference-semantics oracle
"""

__version__ = "0.1.0"
