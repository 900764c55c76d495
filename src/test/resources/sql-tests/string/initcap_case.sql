-- initcap capitalizes space-delimited words only; lower/upper unicode behavior.

query
SELECT initcap('spark sql'), initcap('SPARK SQL'), initcap("o'neil"), initcap('a-b c_d')

query
SELECT initcap(''), initcap(NULL), initcap('  double  spaces')

query
SELECT upper('straße'), lower('İ'), upper('café'), lower('ÇĞİÖŞÜ')

query
SELECT initcap('123abc'), upper(NULL), lower('')
