-- pii_detect / pii_redact: PII classes (cc, email, ip, phone, ssn),
-- class-restricted redaction, null propagation, clean-text passthrough.

query
SELECT pii_detect('write to jane.doe@corp.example.com today')

query
SELECT pii_redact('write to jane.doe@corp.example.com today')

query
SELECT pii_detect('dial 555-867-5309, ssn 078-05-1120, host 10.1.2.3')

query
SELECT pii_redact('dial 555-867-5309, ssn 078-05-1120, host 10.1.2.3')

query
SELECT pii_redact('card 4111-1111-1111-1111 and 4012 8888 8888 1881')

query
SELECT pii_redact('dial 555-867-5309 mail a@b.io', 'email'),
       pii_redact('dial 555-867-5309 mail a@b.io', 'phone'),
       pii_redact('dial 555-867-5309 mail a@b.io', 'email,phone')

query
SELECT pii_detect('no personal data in this sentence'),
       pii_redact('no personal data in this sentence')

query
SELECT pii_detect(CAST(NULL AS STRING)), pii_redact(CAST(NULL AS STRING))

query
SELECT pii_detect(concat('u', CAST(id AS STRING), '@ex.org tel 555-000-', lpad(CAST(id AS STRING), 4, '0'))), count(*)
FROM range(5)
GROUP BY 1 ORDER BY 1

query expect_error(unsupported_class)
SELECT pii_redact('x', 'fingerprint')
